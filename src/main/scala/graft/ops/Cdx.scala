package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURT canonical keys and CDXJ capture-index records — the lookup surface
  * of a web archive. Common Crawl publishes its per-crawl URL index as CDXJ
  * lines (`<surt-key> <14-digit-ts> <json-fields>`, the pywb/OpenWayback
  * convention, IIPC CDXJ spec) keyed by the SURT form of the URL
  * (Sort-friendly URI Reordering Transform, Internet Archive
  * webarchive-commons): host labels reversed and comma-joined so one
  * registered domain's captures are CONTIGUOUS under a lexicographic sort —
  * which is exactly what makes range scans over a 10^12-row index work.
  * A crawl pipeline needs both directions: `format` to publish the index of
  * what it wrote (next to the [[graft.sources.Warc]] writer), `parse` to
  * plan an incremental crawl against the previous index without touching
  * payload bytes.
  *
  * SURT contract here (the Common Crawl / pywb default canonicalization):
  *   - scheme dropped; authority lowercased; default ports stripped
  *     (http :80, https :443), any other port kept as `host:port`;
  *   - one leading `www.` label dropped (the classic alias);
  *   - host labels reversed, comma-joined, closed with `)`;
  *   - path lowercased (SURT keys are case-folded wholesale — distinct
  *     from [[CorpusSignals.canonUrl]], which preserves path case because
  *     it is a fetchable URL, not a sort key);
  *   - query lowercased, split on `&`, empties dropped, params byte-sorted
  *     and rejoined — click-order variants collapse to one key.
  *
  * All scan-side Column arithmetic (parse_url + array ops, codegen'd), no
  * UDF, no exchange; `parse` is substring splits + one `from_json`.
  */
object Cdx {

  /** JSON block of a CDXJ line. All-string fields per the convention (the
    * index is a text artifact; numeric interpretation is the reader's
    * cast, exposed by [[parse]] as typed columns).
    */
  val JsonSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("length", StringType),
    StructField("offset", StringType),
    StructField("filename", StringType)))

  /** SURT sort key of a URL (see object doc for the exact contract). */
  def surtKey(url: Column): Column = {
    val proto = lower(parse_url(url, lit("PROTOCOL")))
    val auth0 = lower(parse_url(url, lit("AUTHORITY")))
    val auth = when(proto === "http", regexp_replace(auth0, ":80$", ""))
      .when(proto === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val hostPart = substring_index(auth, ":", 1)
    val portSuffix = regexp_extract(auth, "(:[0-9]+)$", 1)
    val bare = regexp_replace(hostPart, "^www\\.", "")
    val rev = array_join(reverse(split(bare, "\\.")), ",")
    val path = lower(coalesce(parse_url(url, lit("PATH")), lit("")))
    val kept = filter(
      split(lower(coalesce(parse_url(url, lit("QUERY")), lit(""))), "&"),
      x => x =!= "")
    val q = array_join(array_sort(kept), "&")
    concat(rev, portSuffix, lit(")"), path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Render capture rows as CDXJ lines: `surt(url) ts json`. `ts` must be
    * the 14-digit `yyyyMMddHHmmss` string (kept a string end to end — no
    * session-timezone dependence sneaks into a byte-stable artifact). The
    * seven JSON fields are emitted in fixed schema order with nulls folded
    * to '' so `to_json` never drops a key and lines stay byte-comparable.
    */
  def format(df: DataFrame, urlCol: String = "url", tsCol: String = "ts",
             mimeCol: String = "mime", statusCol: String = "status",
             digestCol: String = "digest", lengthCol: String = "length",
             offsetCol: String = "offset",
             filenameCol: String = "filename"): DataFrame = {
    def str(c: String) = coalesce(col(c).cast("string"), lit(""))
    df.select(concat(
      surtKey(col(urlCol)), lit(" "), col(tsCol).cast("string"), lit(" "),
      to_json(struct(
        str(urlCol).as("url"), str(mimeCol).as("mime"),
        str(statusCol).as("status"), str(digestCol).as("digest"),
        str(lengthCol).as("length"), str(offsetCol).as("offset"),
        str(filenameCol).as("filename")))).as("line"))
  }

  /** Parse CDXJ lines back into typed capture rows. Lines that do not have
    * the three-part `key ts {json}` shape are SKIPPED (a fleet-scale index
    * read survives a truncated shard tail), as are lines whose JSON block
    * fails to parse or carries no `url` (url-less entries are useless to
    * every downstream consumer and PERMISSIVE JSON parsing cannot tell
    * "malformed" from "all fields absent" anyway). `status`/`length`/
    * `offset` surface as BIGINT via try_cast (null when '' or non-numeric
    * — a damaged index field must not kill the job under ANSI mode), the
    * rest as strings.
    */
  def parse(df: DataFrame, lineCol: String = "line"): DataFrame = {
    val line = col(lineCol)
    val key = substring_index(line, " ", 1)
    val ts = regexp_extract(line, "^\\S+ (\\S+) ", 1)
    val json = regexp_extract(line, "^\\S+ \\S+ (\\{.*\\})$", 1)
    df.select(key.as("surt"), ts.as("ts"),
        from_json(json, JsonSchema).as("j"))
      .where(col("surt") =!= "" && col("ts") =!= "" &&
        col("j").isNotNull && col("j.url").isNotNull)
      .select(col("surt"), col("ts"), col("j.url").as("url"),
        col("j.mime").as("mime"),
        expr("try_cast(j.status AS BIGINT)").as("status"),
        col("j.digest").as("digest"),
        expr("try_cast(j.length AS BIGINT)").as("length"),
        expr("try_cast(j.offset AS BIGINT)").as("offset"),
        col("j.filename").as("filename"))
  }
}
