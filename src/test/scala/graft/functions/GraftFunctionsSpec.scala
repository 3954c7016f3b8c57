package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The one-call SQL-surface registration: after registerAll, every custom
  * function resolves and evaluates through plain spark.sql — the migration
  * story's single setup line.
  */
class GraftFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("registerAll: every documented name resolves and evaluates via SQL") {
    val s = spark; import s.implicits._
    GraftFunctions.registerAll(spark)
    Seq((1L, "alpha beta alpha beta gamma"))
      .toDF("id", "t").createOrReplaceTempView("gf_in")
    // one smoke evaluation per registered function, scalar and generator
    val checks = Seq(
      "SELECT py_findall(t, '[a-z]+a') FROM gf_in",
      "SELECT word_shingles(t, 2) FROM gf_in",
      "SELECT rolling_fingerprint(t) FROM gf_in",
      "SELECT rolling_anchors(t, 4, 8) FROM gf_in",
      "SELECT gram_stats(t, 2) FROM gf_in",
      "SELECT norm_nfc(t) FROM gf_in",
      "SELECT deflate_ratio(t) FROM gf_in",
      "SELECT multi_match(t, 'alpha', 'beta gamma') FROM gf_in",
      "SELECT hll_sketch(t, 64) FROM gf_in",
      "SELECT extract_items(t, 1) FROM gf_in")
    checks.foreach { q =>
      val rows = spark.sql(q).collect()
      assert(rows != null, q) // resolution + evaluation must not throw
    }
    // and a value spot-check through two of them
    assert(spark.sql("SELECT multi_match(t, 'alpha') FROM gf_in")
      .head().getSeq[Long](0) == Seq(2L))
    assert(spark.sql("SELECT norm_nfc(t) FROM gf_in")
      .head().getString(0) == "alpha beta alpha beta gamma")
  }
}
