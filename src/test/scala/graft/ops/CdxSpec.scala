package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SURT key + CDXJ index contracts: every canonicalization rule on a
  * crafted URL, the host-contiguity property the key exists for, the
  * format→parse round trip, and malformed-line skipping.
  */
class CdxSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def surt(url: String): String = {
    val s = spark; import s.implicits._
    Seq(url).toDF("url")
      .select(Cdx.surtKey(org.apache.spark.sql.functions.col("url")))
      .collect()(0).getString(0)
  }

  test("surt: scheme drop, case fold, www strip, default port, param sort") {
    assert(surt("HTTPS://WWW.News.Example.CO.UK:443/A/B?b=2&A=1#frag") ===
      "uk,co,example,news)/a/b?a=1&b=2")
    assert(surt("http://example.com/") === "com,example)/")
    // non-default port survives inside the host part
    assert(surt("http://example.com:8080/x") === "com,example:8080)/x")
    // www only strips as a LEADING label
    assert(surt("http://wwwx.example.com/") === "com,example,wwwx)/")
    assert(surt("http://www.www.example.com/") === "com,example,www)/")
    // empty query params collapse; fully-empty query drops its '?'
    assert(surt("http://a.b/p?&&") === "b,a)/p")
  }

  test("surt: captures of one registered domain sort contiguous") {
    val urls = Seq(
      "https://a.example.com/1", "https://other.org/x",
      "https://b.example.com/2", "https://www.example.com/3",
      "https://aardvark.net/y")
    val keys = urls.map(surt).sorted
    val exampleIdx = keys.zipWithIndex
      .filter(_._1.startsWith("com,example")).map(_._2)
    assert(exampleIdx === (exampleIdx.head to exampleIdx.last).toVector)
    assert(exampleIdx.size === 3)
  }

  test("format -> parse round trip recovers typed fields") {
    val s = spark; import s.implicits._
    val crawl = Seq(
      ("https://www.Example.com/Doc?b=1&a=2", "20250218120000", "text/html",
        200L, "d1", 1234L, 0L, "c-0.warc.gz"),
      ("http://h2.org:8080/x", "20250218120001", "application/pdf",
        404L, "d2", 99L, 777L, "c-1.warc.gz"))
      .toDF("url", "ts", "mime", "status", "digest", "length", "offset",
        "filename")
    val back = Cdx.parse(Cdx.format(crawl)).orderBy("ts").collect()
    assert(back.length === 2)
    val r0 = back(0)
    assert(r0.getString(0) === "com,example)/doc?a=2&b=1")
    assert(r0.getString(1) === "20250218120000")
    assert(r0.getString(2) === "https://www.Example.com/Doc?b=1&a=2")
    assert(r0.getString(3) === "text/html")
    assert(r0.getLong(4) === 200L)
    assert(r0.getString(5) === "d1")
    assert(r0.getLong(6) === 1234L)
    assert(r0.getLong(7) === 0L)
    assert(r0.getString(8) === "c-0.warc.gz")
    assert(back(1).getString(0) === "org,h2:8080)/x")
    assert(back(1).getLong(4) === 404L)
  }

  test("parse skips malformed lines and url-less json") {
    val s = spark; import s.implicits._
    val good = """com,ok)/p 20250101000000 {"url":"http://ok/p","mime":"t","status":"200","digest":"d","length":"1","offset":"2","filename":"f"}"""
    val lines = Seq(
      good,
      "truncated",
      "two parts",
      "key 20250101000000 {unclosed",
      "key 20250101000000 {\"mime\":\"no-url\"}",
      "key 20250101000000 not-json-at-all").toDF("line")
    val out = Cdx.parse(lines).collect()
    assert(out.length === 1)
    assert(out(0).getString(2) === "http://ok/p")
  }

  test("seeded fuzz: format -> parse is the identity on 200 random captures") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42) // deterministic
    def label = ("a" + rnd.alphanumeric.take(1 + rnd.nextInt(7)).mkString)
      .toLowerCase
    def path = (0 to rnd.nextInt(4))
      .map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      .mkString("/", "/", if (rnd.nextBoolean()) "" else "/")
    def query = if (rnd.nextBoolean()) "" else
      "?" + (1 to 1 + rnd.nextInt(3))
        .map(_ => s"${rnd.alphanumeric.take(2).mkString}=${rnd.nextInt(99)}")
        .mkString("&")
    val rows = (1 to 200).map { i =>
      val scheme = if (rnd.nextBoolean()) "https" else "http"
      val www = if (rnd.nextInt(4) == 0) "WWW." else ""
      val port = rnd.nextInt(4) match {
        case 0 => ":8080" case 1 => if (scheme == "http") ":80" else ":443"
        case _ => ""
      }
      val url = s"$scheme://$www$label.$label.example.org$port$path$query"
      (url, f"2025${1 + rnd.nextInt(12)}%02d${1 + rnd.nextInt(28)}%02d120000",
        if (rnd.nextBoolean()) "text/html" else "application/pdf",
        200L + rnd.nextInt(300), s"sha1:${rnd.alphanumeric.take(12).mkString}",
        rnd.nextInt(100000).toLong, rnd.nextInt(1000000).toLong,
        s"crawl-${rnd.nextInt(10)}.warc.gz")
    }
    val df = rows.toDF("url", "ts", "mime", "status", "digest", "length",
      "offset", "filename")
    val back = Cdx.parse(Cdx.format(df))
      .select("url", "ts", "mime", "status", "digest", "length", "offset",
        "filename")
      .as[(String, String, String, Long, String, Long, Long, String)]
      .collect().sorted
    assert(back.toSeq === rows.sorted)
  }

  test("parse: non-numeric status/length surface as null, row kept") {
    val s = spark; import s.implicits._
    val line = """k)/ 20250101000000 {"url":"u","mime":"m","status":"-","digest":"d","length":"","offset":"3","filename":"f"}"""
    val out = Cdx.parse(Seq(line).toDF("line")).collect()(0)
    assert(out.isNullAt(4) && out.isNullAt(6))
    assert(out.getLong(7) === 3L)
  }
}
