package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate's contracts: per-group results equal the
  * rank window under (score DESC, id ASC) for both id types; ties break
  * by id; duplicates rank as rows; results are invariant under
  * repartitioning (top-k of a set is order-free); nulls are ignored;
  * k ≥ group size degrades to a full sorted group; SQL registration
  * works; buffers survive serialize/deserialize (exercised by the
  * repartition path's exchange).
  */
class TopKAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** flattened (group, rank, id, score) rows via the aggregate */
  private def viaAgg(df: DataFrame, k: Int): Seq[(String, Int, Any, Long)] =
    df.groupBy("g")
      .agg(graft.ops.CorpusSignals.topKAgg(col("id"), col("score"), k).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col.id"), col("col.score"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.get(2), r.getLong(3))).toSeq.sorted(
        Ordering.by((t: (String, Int, Any, Long)) => (t._1, t._2)))

  /** the same rows via the rank window — the semantic oracle */
  private def viaWindow(df: DataFrame, k: Int): Seq[(String, Int, Any, Long)] = {
    val idCol = if (df.schema("id").dataType.typeName == "string")
      col("id").asc else col("id").asc
    df.withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy(col("score").desc, idCol)))
      .where(col("rank") <= k)
      .collect().map(r => (r.getString(r.fieldIndex("g")),
        r.getInt(r.fieldIndex("rank")), r.get(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("score")))).toSeq.sorted(
        Ordering.by((t: (String, Int, Any, Long)) => (t._1, t._2)))
  }

  private def longCorpus = {
    val s = spark; import s.implicits._
    // scores collide heavily so ties exercise the id tiebreak
    (0 until 400).map(i => (s"g${i % 5}", i.toLong, (i * 37 % 23).toLong))
      .toDF("g", "id", "score")
  }

  test("long ids: parity with the rank window, incl. heavy ties") {
    for (k <- Seq(1, 3, 7)) assert(viaAgg(longCorpus, k) == viaWindow(longCorpus, k), s"k=$k")
  }

  test("string ids: parity with the rank window (binary order)") {
    val s = spark; import s.implicits._
    val df = (0 until 300).map(i => (s"g${i % 4}", f"doc-$i%04d", (i % 11).toLong))
      .toDF("g", "id", "score")
    for (k <- Seq(2, 5)) assert(viaAgg(df, k) == viaWindow(df, k), s"k=$k")
  }

  test("k >= group size returns the whole group, fully sorted") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("a", 3L, 5L)).toDF("g", "id", "score")
    assert(viaAgg(df, 10) == Seq(("a", 1, 2L, 9L), ("a", 2, 1L, 5L), ("a", 3, 3L, 5L)))
  }

  test("duplicate (id, score) rows rank as distinct rows") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 7L, 3L), ("a", 7L, 3L), ("a", 1L, 1L)).toDF("g", "id", "score")
    assert(viaAgg(df, 2) == Seq(("a", 1, 7L, 3L), ("a", 2, 7L, 3L)))
  }

  test("bit-identical under repartitioning; nulls ignored; SQL registration") {
    val base = longCorpus
    val a = viaAgg(base, 4)
    assert(viaAgg(base.repartition(13), 4) == a)
    val s = spark; import s.implicits._
    val withNulls = base.union(
      Seq(("g0", null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(999L)),
          ("g0", java.lang.Long.valueOf(999L), null.asInstanceOf[java.lang.Long]))
        .toDF("g", "id", "score"))
    assert(viaAgg(withNulls, 4) == a, "null id/score rows must not rank")
    TopKAgg.register(spark)
    base.createOrReplaceTempView("tk_in")
    val viaSql = spark.sql(
      """SELECT g, pos + 1 AS rank, t.col.id AS id, t.col.score AS score
         FROM (SELECT g, topk_agg(id, score, 4) AS arr FROM tk_in GROUP BY g)
         LATERAL VIEW posexplode(arr) t AS pos, col""")
      .collect().map(r => (r.getString(0), r.getInt(1), r.get(2), r.getLong(3))).toSeq
      .sorted(Ordering.by((t: (String, Int, Any, Long)) => (t._1, t._2)))
    assert(viaSql == a)
  }
}
