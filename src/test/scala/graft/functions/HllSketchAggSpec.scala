package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom TypedImperativeAggregate's contracts: its per-group register
  * vectors are bit-identical to the (oracle-verified) relational
  * hllRegisters run on each group's slice; results are invariant under
  * repartitioning (merge = max commutes); nulls are ignored; the SQL
  * registration works; and the JVM-side 60-bit hash equals the Column-side
  * portableHash.
  */
class HllSketchAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus = {
    val s = spark; import s.implicits._
    ((0 until 700).map(i => ("a", s"tok-${i % 311}")) ++
      (0 until 300).map(i => ("b", s"b-${i % 71}")) ++
      (0 until 50).map(i => ("c", s"c-${i % 7}"))).toDF("k", "v")
  }

  test("hash60 equals the Column-side portableHash") {
    val s = spark; import s.implicits._
    val vals = Seq("", "a", "tok-1", "héhé", "日本語", "x" * 200)
    val viaColumn = vals.toDF("v")
      .select(col("v"), graft.ops.TextDedup.portableHash(col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(HllSketchAgg.hash60(UTF8String.fromString(v)) == viaColumn(v), v)
    }
  }

  test("per-group registers are bit-identical to the relational hllRegisters") {
    val df = corpus
    val got = df.groupBy("k")
      .agg(graft.ops.CorpusSignals.hllSketchAgg(col("v"), m = 64).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    for (k <- Seq("a", "b", "c")) {
      val exp = graft.ops.CorpusSignals
        .hllRegisters(df.where(col("k") === k), col("v"), m = 64)
        .orderBy("bucket").collect().map(_.getLong(1)).toSeq
      assert(got(k) == exp, k)
    }
  }

  test("bit-identical under repartitioning; null values are ignored") {
    val s = spark; import s.implicits._
    val base = corpus
    val a = base.groupBy("k")
      .agg(graft.ops.CorpusSignals.hllSketchAgg(col("v"), m = 32).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val b = base.repartition(13).groupBy("k")
      .agg(graft.ops.CorpusSignals.hllSketchAgg(col("v"), m = 32).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(a == b)
    val withNulls = base.union(
      Seq(("a", null: String), ("c", null: String)).toDF("k", "v"))
    val c = withNulls.groupBy("k")
      .agg(graft.ops.CorpusSignals.hllSketchAgg(col("v"), m = 32).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(c == a, "nulls must not touch any register")
  }

  test("SQL registration: hll_sketch(v, m) aggregates through the registry") {
    val s = spark; import s.implicits._
    HllSketchAgg.register(spark)
    corpus.createOrReplaceTempView("hs_in")
    val viaSql = spark.sql(
        "SELECT k, hll_sketch(v, 64) AS r FROM hs_in GROUP BY k")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val direct = corpus.groupBy("k")
      .agg(graft.ops.CorpusSignals.hllSketchAgg(col("v"), m = 64).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaSql == direct)
  }
}
