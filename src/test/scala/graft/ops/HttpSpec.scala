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
}
