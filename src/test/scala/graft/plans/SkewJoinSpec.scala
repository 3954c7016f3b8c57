package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark 4's AQE skew-join handling the way BucketedJoinSpec pins
  * bucketing: a deliberately skewed join key (one host carrying most of
  * the corpus — the exact shape the pipeline's salted repartition defuses
  * for the PARSE stage) must be split by AQE at JOIN time into multiple
  * reader slices instead of landing on one straggler task. This is the
  * production answer for skewed joins the salt can't help with (the salt
  * changes the parse-stage key, not a join key): leave the join
  * declarative and let the runtime re-plan split it.
  */
class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("skew-join-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // scale the skew thresholds down to test size (defaults are tuned
      // for 256MB partitions; the MECHANISM under test is the same)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // force a sort-merge join: broadcast would dodge the skew entirely
      // (and IS the right plan when the dim side is small — see the
      // broadcast assertions in the catalog's ANN queries)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("AQE splits the skewed host partition at join time (plan + result pinned)") {
    val s = spark; import s.implicits._
    // 50k urls, 80% on host-0 (heavier than the corpus's 30% host-0 skew),
    // payload column inflates bytes so the skewed partition crosses the
    // threshold
    val pages = s.range(0, 50000).select(
      when(pmod(col("id"), lit(10)) < 8, lit("host-0"))
        .otherwise(concat(lit("host-"), pmod(col("id"), lit(10)).cast("string"))).as("host"),
      col("id").as("doc_id"),
      concat(lit("payload-"), col("id").cast("string"),
        lit("x" * 64)).as("payload"))
    val hostMeta = s.range(0, 10)
      .select(concat(lit("host-"), col("id").cast("string")).as("host"),
        (col("id") * 7).as("crawl_priority"))

    val joined = pages.join(hostMeta, "host")
    // materialize through THE SAME QueryExecution (count() would build a
    // new one and leave this plan isFinalPlan=false)
    assert(joined.collect().length == 50000) // every host matches one meta row

    // the FINAL adaptive plan (only materialized after execution) must
    // show skew-split shuffle reads feeding the sort-merge join
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(plan.contains("skew"), s"expected AQE skew-split reader in:\n$plan")

    // control: same join with skew handling off runs the fat partition
    // whole — no skew readers in the plan
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try {
      val ctl = pages.join(hostMeta, "host")
      assert(ctl.collect().length == 50000)
      val ctlPlan = ctl.queryExecution.executedPlan.toString
      assert(!ctlPlan.contains("skew"), s"control must not skew-split:\n$ctlPlan")
    } finally s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  }
}
