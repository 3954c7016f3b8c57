package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level quality filtering — the CHEAPEST gate in a crawl curation
  * chain because it runs before any payload byte is fetched or parsed.
  * RefinedWeb (Penedo et al. 2023 §3.1) and CCNet both front-load exactly
  * this class of rule: spammy hosts, machine-generated URL shapes, media
  * resources, and adult/gambling URL words predict low-value payloads well
  * enough to cut fetch volume by double-digit percents. Per-rule verdict
  * columns (the [[CorpusSignals.gopherGate]] reporting convention) plus a
  * composite `u_keep`, all scan-side Column arithmetic over parse_url —
  * zero exchange, so the gate fuses into whatever scan feeds it.
  *
  * Rules (each independently thresholded, integer arithmetic only):
  *   - `u_len_ok`      total URL length ≤ maxLen (session-id / tracking
  *                     blobs produce kilometer URLs)
  *   - `u_host_digit_ok` digit share of the host ≤ permille threshold
  *                     (auto-generated spam farms: h8h3k9x2.example)
  *   - `u_labels_ok`   host label count ≤ maxLabels (subdomain explosion)
  *   - `u_depth_ok`    path segment depth ≤ maxDepth (calendar/faceted
  *                     crawler traps live deep)
  *   - `u_params_ok`   query param count ≤ maxParams (faceted search)
  *   - `u_ext_ok`      path doesn't end in a media/binary extension — the
  *                     payload can't be main-content text
  *   - `u_words_ok`    no blocklisted word among the URL's alphanumeric
  *                     tokens (token-exact, lowercased — not substring, the
  *                     same Scunthorpe defense as the C4 text gate)
  */
object UrlFilter {

  /** Adult/spam URL words — the classic URL-level list (kept token-exact;
    * extend per deployment). */
  val DefaultBlockwords: Seq[String] =
    Seq("porn", "xxx", "sex", "casino", "viagra", "torrent")

  /** Media / binary resource extensions that cannot carry main content. */
  val MediaExtRe: String =
    "\\.(jpe?g|png|gif|webp|bmp|ico|svg|css|js|woff2?|ttf|eot|mp3|mp4|avi|mov|wmv|flv|zip|gz|tgz|tar|rar|7z|exe|dmg|iso)$"

  def gate(df: DataFrame, urlCol: String,
           maxLen: Int = 512, maxLabels: Int = 6, maxDepth: Int = 8,
           maxParams: Int = 8, maxHostDigitPermille: Int = 400,
           blockwords: Seq[String] = DefaultBlockwords): DataFrame = {
    val url = col(urlCol)
    val host = lower(coalesce(parse_url(url, lit("HOST")), lit("")))
    val path = coalesce(parse_url(url, lit("PATH")), lit(""))
    val query = coalesce(parse_url(url, lit("QUERY")), lit(""))
    val hostDigits = length(regexp_replace(host, "[^0-9]", ""))
    val toks = filter(split(lower(url), "[^a-z0-9]+"), x => x =!= "")
    val rules: Seq[(String, Column)] = Seq(
      "u_len_ok" -> (length(url) <= maxLen),
      "u_host_digit_ok" ->
        (hostDigits * 1000 <= length(host) * maxHostDigitPermille),
      "u_labels_ok" -> (size(split(host, "\\.")) <= maxLabels),
      "u_depth_ok" ->
        (size(filter(split(path, "/"), x => x =!= "")) <= maxDepth),
      "u_params_ok" ->
        (size(filter(split(query, "&"), x => x =!= "")) <= maxParams),
      "u_ext_ok" -> !lower(path).rlike(MediaExtRe),
      "u_words_ok" ->
        !arrays_overlap(toks, array(blockwords.map(lit): _*)))
    df.select(col("*") +:
      rules.map { case (n, c) => c.as(n) } :+
      rules.map(_._2).reduce(_ && _).as("u_keep"): _*)
  }
}
