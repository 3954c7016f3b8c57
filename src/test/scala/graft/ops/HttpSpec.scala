package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HTTP envelope contracts: status parsing, case-insensitive first-match
  * headers, charset parameter variants, non-HTTP isolation (a colon in
  * body text must not parse as a header), and degenerate payloads.
  */
class HttpSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def eval(payload: String, c: Column => Column) = {
    val s = spark; import s.implicits._
    Seq(Tuple1(payload.getBytes("UTF-8"))).toDF("p")
      .select(c(col("p"))).collect()(0)
  }

  private val ok =
    "HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; charset=\"UTF-8\"\r\n" +
      "Location: /a\r\nlocation: /b\r\n\r\n<html>body: not-a-header"

  test("status, media type, quoted charset, first-match headers") {
    assert(eval(ok, Http.httpStatus).getLong(0) === 200L)
    assert(eval(ok, Http.contentType).getString(0) === "text/html")
    assert(eval(ok, Http.headerCharset).getString(0) === "utf-8")
    // first occurrence wins; lookup is case-insensitive
    assert(eval(ok, Http.httpHeader(_, "LOCATION")).getString(0) === "/a")
    // a colon line in the BODY is not a header
    assert(eval(ok, Http.httpHeader(_, "body")).getString(0) === "")
  }

  test("non-HTTP payloads yield null status and empty fields") {
    val html = "<html>Content-Type: text/fake\r\n\r\nx"
    assert(eval(html, Http.httpStatus).isNullAt(0))
    assert(eval(html, Http.contentType).getString(0) === "")
    assert(eval("", Http.httpStatus).isNullAt(0))
  }

  test("charset without quotes, parameter order, absent charset") {
    val p = "HTTP/1.0 404 NF\r\nCONTENT-TYPE: text/plain;charset=iso-8859-1\r\n\r\n"
    assert(eval(p, Http.httpStatus).getLong(0) === 404L)
    assert(eval(p, Http.headerCharset).getString(0) === "iso-8859-1")
    val noCs = "HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n%PDF"
    assert(eval(noCs, Http.headerCharset).getString(0) === "")
    assert(eval(noCs, Http.contentType).getString(0) === "application/pdf")
  }

  test("truncated head (no CRLFCRLF) still parses the visible headers") {
    val cut = "HTTP/1.1 200 OK\r\nContent-Type: text/html"
    assert(eval(cut, Http.httpStatus).getLong(0) === 200L)
    assert(eval(cut, Http.contentType).getString(0) === "text/html")
  }

  test("malformed status line: HTTP prefix but no code -> null status") {
    assert(eval("HTTP/1.1 oops\r\n\r\n", Http.httpStatus).isNullAt(0))
  }

  private def resolve(rows: Seq[(String, String)], maxHops: Int) = {
    val s = spark; import s.implicits._
    Http.resolveRedirects(rows.toDF("url", "loc"), "url", "loc", maxHops)
      .as[(String, String, Long, String)].collect().toMap2
  }

  implicit private class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("resolveRedirects: ok / dangling / loop-exhausted / zero-hop") {
    val out = resolve(Seq(
      ("a", "b"), ("b", "c"), ("c", null),  // 2-hop chain to a fetched page
      ("d", "e"),                           // e never fetched
      ("f", "g"), ("g", "f"),               // 2-cycle
      ("h", ""),                            // '' loc = non-redirect
      ("i", null)), maxHops = 4)
    assert(out("a") === (("c", 2L, "ok")))
    assert(out("b") === (("c", 1L, "ok")))
    assert(out("c") === (("c", 0L, "ok")))
    assert(out("d") === (("e", 1L, "dangling")))
    assert(out("f") === (("f", 4L, "exhausted")))
    assert(out("g") === (("g", 4L, "exhausted")))
    assert(out("h") === (("h", 0L, "ok")))
    assert(out("i") === (("i", 0L, "ok")))
  }

  test("resolveRedirects: chain of length maxHops exhausts; maxHops-1 resolves") {
    val chain = Seq(("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"),
      ("p5", null))
    // 4 redirects with 4 lookups: every lookup spent moving, p5 never probed
    assert(resolve(chain, 4)("p1") === (("p5", 4L, "exhausted")))
    assert(resolve(chain, 5)("p1") === (("p5", 4L, "ok")))
    assert(resolve(chain, 4)("p2") === (("p5", 3L, "ok")))
  }
}
