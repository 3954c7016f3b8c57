package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Template mining contracts: digit-run collapse, query exclusion, the
  * trap cap boundary, and map-side-combinable plan shape.
  */
class UrlTemplateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("digit runs collapse; query and fragment are excluded from the shape") {
    val s = spark; import s.implicits._
    val r = Seq(
      "https://A.com/product/123/view?page=9#x",
      "https://a.com/product/98765/view",
      "https://a.com/no-digits/here").toDF("url")
    val out = UrlTemplate.mine(r, "url", cap = 10L)
      .orderBy("tpl").collect()
    assert(out.length === 2)
    assert(out(0).getString(1) === "/no-digits/here")
    assert(out(0).getLong(2) === 1L)
    // host case-folds, both ids hit one template
    assert(out(1).getString(0) === "a.com")
    assert(out(1).getString(1) === "/product/*/view")
    assert(out(1).getLong(2) === 2L)
  }

  test("trap flips strictly past the cap") {
    val s = spark; import s.implicits._
    val urls = (1 to 5).map(i => s"https://h.com/p/$i") :+
      "https://h.com/only-once"
    val out = UrlTemplate.mine(urls.toDF("url"), "url", cap = 4L)
      .orderBy("tpl").collect()
    assert(out.map(r => (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSeq === Seq(("/only-once", 1L, false), ("/p/*", 5L, true)))
    // at cap exactly -> not a trap
    val at = UrlTemplate.mine(urls.toDF("url"), "url", cap = 5L)
      .where("tpl = '/p/*'").collect()(0)
    assert(!at.getBoolean(3))
  }

  test("count aggregate combines map-side (partial_count in the plan)") {
    val s = spark; import s.implicits._
    val df = UrlTemplate.mine(
      (1 to 100).map(i => s"https://h.com/p/$i").toDF("url"), "url", 10L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial count") ||
      p.contains("count(1)"), s"expected a partial count aggregate:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"))
  }
}
