package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL template mining — the crawler-trap detector: calendars, faceted
  * search, session-id paths, and auto-generated product pages all share
  * one path SHAPE with an unbounded id slot. Collapsing digit runs to `*`
  * turns every instance of the shape into one key; a (host, template)
  * whose count explodes past a cap is a trap (or at best a low-value
  * template farm), and the flag drives frontier throttling long before a
  * per-URL quality model ever sees the pages.
  *
  * One algebraic count aggregate on the (host, template) key — map-side
  * combinable (a hot template collapses per task before the shuffle,
  * exactly like the upsert merge), no window, no join.
  */
object UrlTemplate {

  /** Path template of a URL: digit runs in the path collapse to `*`
    * (query/fragment excluded — param explosion is [[UrlFilter]]'s rule).
    */
  def pathTemplate(url: Column): Column =
    regexp_replace(coalesce(parse_url(url, lit("PATH")), lit("")),
      "[0-9]+", "*")

  /** Per-(host, template) instance counts with a `trap` verdict at `cap`.
    * Emits every template — the non-trap rows are the per-host shape
    * census a crawl report wants anyway.
    */
  def mine(df: DataFrame, urlCol: String, cap: Long): DataFrame =
    df.select(CorpusSignals.host(col(urlCol)).as("host"),
        pathTemplate(col(urlCol)).as("tpl"))
      .groupBy("host", "tpl")
      .agg(count(lit(1)).as("n"))
      .withColumn("trap", col("n") > cap)
}
