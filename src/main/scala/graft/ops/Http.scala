package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTTP response-envelope parsing for crawl payloads. Common Crawl
  * `response` records carry the raw HTTP message; [[graft.sources.Warc]]
  * splits the body off at the first CRLFCRLF but the HEAD block itself
  * holds three things a pipeline needs before any byte of body parsing:
  * the status code (2xx keep / 3xx follow / 4xx-5xx drop), the declared
  * Content-Type with its charset parameter (the FIRST link in the WHATWG
  * decode chain, ahead of BOM/meta sniffing), and the redirect Location.
  *
  * All scan-side Column arithmetic over a 2 KiB decoded prefix (headers
  * live at the front; RFC 9112 gives no length bound but real crawlers cap
  * exactly like this), case-insensitive header match via `(?im)` — a flag
  * pair Java regex and RE2 both support, so oracles run the same pattern.
  * Non-HTTP payloads (no `HTTP/1.` prefix) yield null status and ''
  * fields rather than misparsing body text that happens to contain a
  * colon.
  */
object Http {

  /** Decoded head block: everything before the first CRLFCRLF in the
    * leading 2 KiB (total on short/empty/binary payloads).
    */
  def headBlock(payload: Column): Column =
    substring_index(
      coalesce(substring(payload, 1, 2048).cast("string"), lit("")),
      "\r\n\r\n", 1)

  private def isHttp(head: Column): Column = head.startsWith("HTTP/1.")

  /** Status code as BIGINT; null when the payload is not an HTTP message
    * or the status line is malformed.
    */
  def httpStatus(payload: Column): Column = {
    val head = headBlock(payload)
    val code = regexp_extract(head, "^HTTP/1\\.[01] ([0-9]{3})", 1)
    when(isHttp(head) && code =!= "", code.cast("long"))
  }

  /** Raw value of `name` (case-insensitive, first occurrence), '' when
    * absent or not an HTTP message.
    */
  def httpHeader(payload: Column, name: String): Column = {
    val head = headBlock(payload)
    val quoted = java.util.regex.Pattern.quote(name)
    when(isHttp(head),
      trim(regexp_extract(head, s"(?im)^$quoted:[ \\t]*([^\\r\\n]*)", 1)))
      .otherwise("")
  }

  /** Media type of Content-Type, lowercased, parameters stripped. */
  def contentType(payload: Column): Column =
    lower(trim(substring_index(httpHeader(payload, "Content-Type"), ";", 1)))

  /** charset= parameter of Content-Type, lowercased, optional quotes
    * dropped; '' when absent.
    */
  def headerCharset(payload: Column): Column =
    lower(regexp_extract(httpHeader(payload, "Content-Type"),
      "(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1))
}
