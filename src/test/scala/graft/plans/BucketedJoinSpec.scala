package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing for co-located joins (SURVEY §4.2 / the 100 TB playbook):
  * two fact tables written with `bucketBy(k, joinKey).sortBy(joinKey)`
  * join with NO exchange on either side — the shuffle is paid once at
  * write time and amortized over every subsequent join. This is the
  * technique a recurring 100 TB join pipeline uses instead of
  * re-shuffling both inputs per run; the spec pins that the plan Spark
  * produces over our tables is genuinely exchange-free.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketed")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketBy join plans with zero exchanges on either side") {
    val s = spark; import s.implicits._
    val orders = (1L to 400L).map(k => (k, s"status${k % 3}")).toDF("o_orderkey", "status")
    val lineitem = (1L to 400L).flatMap(k => Seq((k, k * 2.0), (k, k * 3.0)))
      .toDF("l_orderkey", "l_price")
    // repartition on the bucket key first → one file per bucket
    orders.repartition(8, col("o_orderkey")).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.repartition(8, col("l_orderkey")).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // the claim that matters at 100 TB: NO exchange on either side — the
    // shuffle was paid once at write. (The SMJ's per-run within-partition
    // Sort remains: since SPARK-28632, bucketed scans don't report the
    // write-time sortBy order unless the legacy outputOrdering conf is on;
    // that sort is local and cheap, the exchange was the network cost.)
    assert(!plan.contains("Exchange"), plan.linesIterator.take(8).mkString("\n"))
    assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(8).mkString("\n"))
    assert(joined.count() == 800L)

    // control: the same join over unbucketed parquet DOES shuffle both sides
    val unbucketedPlan = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(unbucketedPlan.contains("Exchange"))
  }
}
