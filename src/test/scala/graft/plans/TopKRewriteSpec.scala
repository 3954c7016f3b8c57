package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rewrite's contracts: the rank-window top-k idiom becomes
  * the k-bounded aggregate plan (no Window operator, topk_agg Aggregate)
  * with bit-identical results and unchanged output schema/order; every
  * soundness guard (extra visible column, nullable order key, unsupported
  * condition shape) keeps the window plan; the conf kill-switch works.
  */
class TopKRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def base = {
    val s = spark; import s.implicits._
    (0 until 300).map(i => (s"g${i % 5}", i.toLong, (i * 37 % 23).toLong))
      .toDF("g", "id", "score")
  }

  private def topkDf(df: DataFrame, pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    df.withColumn("rank",
        row_number().over(W.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .where(pred(col("rank")))

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case w: Window => w }.nonEmpty

  private def hasTopKAgg(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.exists(_.isInstanceOf[graft.functions.TopKAgg])) => a
    }.nonEmpty

  private def rows(df: DataFrame): Seq[(String, Long, Long, Int)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))

  test("rank <= k rewrites to the aggregate plan; results bit-equal to the window path") {
    val q = topkDf(base, _ <= 3)
    assert(!hasWindow(q), s"Window must be rewritten away:\n${q.queryExecution.optimizedPlan}")
    assert(hasTopKAgg(q), s"plan must aggregate via topk_agg:\n${q.queryExecution.optimizedPlan}")
    assert(q.schema.fieldNames.toSeq == Seq("g", "id", "score", "rank"))
    spark.conf.set("spark.graft.topkRewrite", "false")
    val expected = try rows(topkDf(base, _ <= 3))
    finally spark.conf.set("spark.graft.topkRewrite", "true")
    assert(rows(q) == expected)
  }

  test("rank < k and the reversed-literal comparison also fire") {
    val lt = topkDf(base, _ < 4)
    assert(!hasWindow(lt) && hasTopKAgg(lt))
    val rev = topkDf(base, r => lit(2) >= r)
    assert(!hasWindow(rev) && hasTopKAgg(rev))
    spark.conf.set("spark.graft.topkRewrite", "false")
    val (eLt, eRev) = try (rows(topkDf(base, _ < 4)), rows(topkDf(base, r => lit(2) >= r)))
    finally spark.conf.set("spark.graft.topkRewrite", "true")
    assert(rows(lt) == eLt && rows(rev) == eRev)
  }

  test("string ids rewrite and agree with the window path") {
    val s = spark; import s.implicits._
    // a String column from toDF is nullable and must NOT fire the rule —
    // derive a provably non-null string id instead
    val df = (0 until 200).map(i => (s"g${i % 4}", i, (i % 9).toLong))
      .toDF("g", "i", "score")
      .select(col("g"),
        concat(lit("d"), lpad(col("i").cast("string"), 4, "0")).as("id"),
        col("score"))
    val q = df.withColumn("rank",
        row_number().over(W.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .where(col("rank") <= 2)
    assert(!hasWindow(q) && hasTopKAgg(q))
    def str(d: DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    spark.conf.set("spark.graft.topkRewrite", "false")
    val expected = try str(df.withColumn("rank",
        row_number().over(W.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .where(col("rank") <= 2))
    finally spark.conf.set("spark.graft.topkRewrite", "true")
    assert(str(q) == expected)
  }

  test("soundness guards keep the window plan") {
    val s = spark; import s.implicits._
    // an extra column flows through the window — the aggregate would drop it
    val wide = (0 until 50).map(i => (s"g${i % 3}", i.toLong, (i % 7).toLong, s"t$i"))
      .toDF("g", "id", "score", "text")
    assert(hasWindow(wide.withColumn("rank",
        row_number().over(W.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .where(col("rank") <= 3)))
    // nullable score — the aggregate skips nulls, the window ranks them
    val nullable = base.withColumn("score", when(col("score") >= 0, col("score")))
    assert(hasWindow(topkDf(nullable, _ <= 3)))
    // nullable string id (the default for toDF strings) — same reason
    val nullableId = {
      val s = spark; import s.implicits._
      (0 until 50).map(i => (s"g${i % 3}", s"d$i", (i % 7).toLong)).toDF("g", "id", "score")
    }
    assert(hasWindow(nullableId.withColumn("rank",
        row_number().over(W.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .where(col("rank") <= 3)))
    // ascending score — not the aggregate's total order
    assert(hasWindow(base.withColumn("rank",
        row_number().over(W.partitionBy("g").orderBy(col("score").asc, col("id").asc)))
      .where(col("rank") <= 3)))
    // rank() instead of row_number(): ties share ranks, k can overflow
    assert(hasWindow(base.withColumn("rank",
        rank().over(W.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .where(col("rank") <= 3)))
  }

  test("spark.graft.topkRewrite=false disables the rule") {
    spark.conf.set("spark.graft.topkRewrite", "false")
    try assert(hasWindow(topkDf(base, _ <= 3)))
    finally spark.conf.set("spark.graft.topkRewrite", "true")
  }
}
