package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** URL gate contracts: each rule trips on exactly its violator, the
  * blockword match is token-exact (Scunthorpe defense), and a plain URL
  * passes everything.
  */
class UrlFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def gate(url: String): Row = {
    val s = spark; import s.implicits._
    UrlFilter.gate(Seq(url).toDF("url"), "url").collect()(0)
  }

  private def failedRules(r: Row): Set[String] =
    r.schema.fields.zipWithIndex.collect {
      case (f, i) if f.name.startsWith("u_") && f.name != "u_keep" &&
        !r.getBoolean(i) => f.name
    }.toSet

  test("clean URL passes every rule") {
    val r = gate("https://news.example.com/2024/science/article-42?page=2")
    assert(failedRules(r).isEmpty)
    assert(r.getAs[Boolean]("u_keep"))
  }

  test("each rule trips on exactly its violator") {
    assert(failedRules(gate("https://a.example.com/" + "x" * 600)) ===
      Set("u_len_ok"))
    assert(failedRules(gate("https://x123456789012.example.com/a")) ===
      Set("u_host_digit_ok"))
    assert(failedRules(gate("https://a.b.c.d.e.f.example.com/a")) ===
      Set("u_labels_ok"))
    assert(failedRules(gate("https://a.com/1/2/3/4/5/6/7/8/9")) ===
      Set("u_depth_ok"))
    assert(failedRules(gate(
      "https://a.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9")) ===
      Set("u_params_ok"))
    assert(failedRules(gate("https://a.com/img/photo.JPEG")) ===
      Set("u_ext_ok"))
    assert(failedRules(gate("https://a.com/casino/welcome")) ===
      Set("u_words_ok"))
  }

  test("blockword match is token-exact, not substring") {
    // 'sex' inside a larger token must NOT trip (the Scunthorpe defense)
    assert(gate("https://sussex.example.com/essexhistory")
      .getAs[Boolean]("u_words_ok"))
    // ...but as its own token it does, anywhere in the URL
    assert(!gate("https://a.com/article?tag=sex")
      .getAs[Boolean]("u_words_ok"))
  }

  test("extension match anchors at path end and ignores the query") {
    assert(gate("https://a.com/download.zip.html").getAs[Boolean]("u_ext_ok"))
    assert(gate("https://a.com/page?file=x.zip").getAs[Boolean]("u_ext_ok"))
    assert(!gate("https://a.com/x.tar").getAs[Boolean]("u_ext_ok"))
  }

  test("pathless / queryless URLs survive with rules passing") {
    val r = gate("https://example.com")
    assert(failedRules(r).isEmpty)
  }
}
