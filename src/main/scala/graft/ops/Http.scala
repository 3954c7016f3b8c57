package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Redirect-chain resolution over a crawled (url, location) table: for
    * every url, follow `Location` targets through up to `maxHops` lookups
    * and report where the chain lands. Outcomes: `ok` (reached a
    * non-redirect page), `dangling` (chain left the crawl — the target was
    * never fetched), `exhausted` (still redirecting after `maxHops`
    * lookups — covers loops, which can never resolve). `n_hops` counts the
    * redirects actually followed. The location extraction itself is the
    * already-pinned [[httpHeader]]/q_http contract; this operator pins the
    * graph walk.
    *
    * Scale: `maxHops` unrolled left equi-joins on the url key — each hop is
    * one shuffle of the still-walking rows against the corpus-sized edge
    * table, the standard bounded-iteration frontier walk (crawlers cap
    * redirect chains at 5-10 hops, so the unroll is small and fixed).
    * Single linear plan — no branch-and-union, so lineage stays O(maxHops)
    * and nothing needs checkpointing. Resolved rows ride along with their
    * outcome frozen; AQE sizes the per-hop exchanges as the frontier
    * shrinks.
    *
    * @param pages  one row per fetched url
    * @param urlCol the fetched url column
    * @param locCol redirect target ('' or null for non-redirect pages)
    */
  def resolveRedirects(pages: DataFrame, urlCol: String, locCol: String,
                       maxHops: Int = 5): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    // __hit marks an actual match: a using-column left join can't otherwise
    // tell "target never fetched" (dangling) from "target is a non-redirect
    // page" (ok) — both leave __loc null.
    val edges = pages.select(col(urlCol).as("__cur"),
      when(col(locCol).isNotNull && col(locCol) =!= "", col(locCol))
        .as("__loc"),
      lit(true).as("__hit"))
    var st = pages.select(col(urlCol).as("url"), col(urlCol).as("__cur"),
      lit(0L).as("n_hops"), lit(null).cast("string").as("outcome"))
    for (_ <- 1 to maxHops) {
      val frozen = col("outcome").isNotNull || col("__hit").isNull ||
        col("__loc").isNull
      st = st.join(edges, Seq("__cur"), "left")
        .select(col("url"),
          when(frozen, col("__cur")).otherwise(col("__loc")).as("__cur"),
          when(frozen, col("n_hops")).otherwise(col("n_hops") + 1)
            .as("n_hops"),
          when(col("outcome").isNotNull, col("outcome"))
            .when(col("__hit").isNull, lit("dangling"))
            .when(col("__loc").isNull, lit("ok"))
            .otherwise(lit(null).cast("string")).as("outcome"))
    }
    st.select(col("url"), col("__cur").as("final_url"), col("n_hops"),
      coalesce(col("outcome"), lit("exhausted")).as("outcome"))
  }
}
