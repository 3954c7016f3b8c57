package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The zone-map contracts: pruned reads are bit-equal to the unpruned
  * filtered read (soundness) on any layout; on a z-ordered layout BOTH
  * interleaved columns actually prune files (the tight-ranges payoff);
  * an impossible range reads zero files; the sidecar stats equal the
  * per-file truth; all-null stat files are never pruned.
  */
class ZoneMapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("zonemap").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus = {
    val s = spark; import s.implicits._
    // two independent-ish long columns so z-order locality is non-trivial
    (0 until 20000).map { i =>
      (i.toLong, ((i * 2654435761L) % 10000 + 10000).toLong, s"doc-$i")
    }.toDF("doc_id", "n_chars", "text")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted

  test("z-ordered layout: both interleaved columns prune files; results bit-equal") {
    val path = s"$dir/zordered"
    graft.ops.ZOrder.zorderWrite(corpus, Seq("doc_id", "n_chars"), path, files = 16)
    val stats = ZoneMaps.write(spark, path, Seq("doc_id", "n_chars"))
    assert(stats.size == 16)
    val total = stats.size
    // prune on the FIRST interleaved column
    val r1 = Map("doc_id" -> ((100L, 700L)))
    val kept1 = ZoneMaps.prunedFiles(path, r1)
    assert(kept1.size < total / 2, s"doc_id range must prune: ${kept1.size}/$total")
    assert(sortedRows(ZoneMaps.read(spark, path, r1)).toSeq ==
      sortedRows(spark.read.parquet(path).where(col("doc_id").between(100, 700))).toSeq)
    // prune on the SECOND interleaved column — the z-order promise: a
    // single-column sort gives this one no locality at all
    val r2 = Map("n_chars" -> ((10000L, 10600L)))
    val kept2 = ZoneMaps.prunedFiles(path, r2)
    assert(kept2.size < total / 2, s"n_chars range must prune too: ${kept2.size}/$total")
    assert(sortedRows(ZoneMaps.read(spark, path, r2)).toSeq ==
      sortedRows(spark.read.parquet(path).where(col("n_chars").between(10000, 10600))).toSeq)
    // conjunction prunes at least as hard as either column alone
    val kept12 = ZoneMaps.prunedFiles(path, r1 ++ r2)
    assert(kept12.size <= math.min(kept1.size, kept2.size))
    // impossible range: zero files, empty result, schema intact
    val none = ZoneMaps.read(spark, path, Map("doc_id" -> ((-50L, -1L))))
    assert(ZoneMaps.prunedFiles(path, Map("doc_id" -> ((-50L, -1L)))).isEmpty)
    assert(none.count() == 0 && none.columns.toSeq == Seq("doc_id", "n_chars", "text"))
  }

  test("random layout: pruning degrades but stays sound (bit-equal results)") {
    val path = s"$dir/random"
    corpus.orderBy(md5(col("text"))).repartition(8)
      .write.mode("overwrite").parquet(path)
    ZoneMaps.write(spark, path, Seq("doc_id"))
    val ranges = Map("doc_id" -> ((100L, 700L)))
    // hash layout: every file spans ~the full doc_id range — nothing prunes
    assert(ZoneMaps.prunedFiles(path, ranges).size == 8)
    assert(sortedRows(ZoneMaps.read(spark, path, ranges)).toSeq ==
      sortedRows(spark.read.parquet(path).where(col("doc_id").between(100, 700))).toSeq)
  }

  test("sidecar stats equal the per-file truth; null stats never prune") {
    val path = s"$dir/truth"
    graft.ops.ZOrder.zorderWrite(corpus, Seq("doc_id", "n_chars"), path, files = 4)
    ZoneMaps.write(spark, path, Seq("doc_id", "n_chars"))
    val want = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    ZoneMaps.readSidecar(path).foreach { e =>
      val (lo, hi) = e.stats("doc_id")
      assert((lo.get, hi.get) == want(e.file), e.file)
    }
    // a file whose stat column is entirely null must survive every range
    val s = spark; import s.implicits._
    val nullPath = s"$dir/nulls"
    Seq((null.asInstanceOf[java.lang.Long], "x"), (null.asInstanceOf[java.lang.Long], "y"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(nullPath)
    ZoneMaps.write(spark, nullPath, Seq("doc_id"))
    assert(ZoneMaps.prunedFiles(nullPath, Map("doc_id" -> ((0L, 1L)))).size == 1)
  }
}
