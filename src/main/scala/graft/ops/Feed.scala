package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.html.{Tokenizer, TEnd, TStart, TText}

/** RSS 2.0 / Atom feed parsing — the third crawl-discovery surface next to
  * [[Sitemap]] and [[Robots]] sitemaps: feeds announce NEW urls hours to
  * days before a sitemap refresh, so a freshness-oriented crawler reads
  * them first. One pass handles both dialects (a fleet fetch can't know
  * which it got until it parses):
  *
  *  - an entry opens at `<item>` (RSS, kind `rss`) or `<entry>` (Atom,
  *    kind `atom`) and emits at its close tag;
  *  - RSS fields are text containers: `<title>`, `<link>`, `<pubDate>`,
  *    `<guid>`;
  *  - Atom: `<title>`, `<id>`, `<updated>` text containers; the link is
  *    the FIRST `<link>` whose `rel` is absent or `alternate` (RFC 4287
  *    §4.2.7.2: missing rel means alternate), read from its `href`
  *    attribute — self-closing or not; `rel="self"/"enclosure"/...` links
  *    are skipped;
  *  - channel-/feed-level `<title>`/`<link>` OUTSIDE entries are ignored
  *    (the state machine only captures inside an open entry);
  *  - entries without a non-empty link are DROPPED (a frontier seed
  *    without a URL is useless); other absent fields surface as '';
  *  - values are trimmed and entity-decoded (the tokenizer decodes both
  *    text and attribute values); `entry_no` numbers emitted entries in
  *    document order.
  *
  * Plan shape: narrow scan-stage flatMap (the sanctioned tokenizer
  * region), zero exchange — identical to [[Sitemap.parse]].
  */
object Feed {

  private val rssFields = Set("title", "link", "pubdate", "guid")
  private val atomFields = Set("title", "id", "updated")

  def parse(df: DataFrame, idCol: String = "doc_id",
            xmlCol: String = "xml"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(xmlCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, xml) =>
        val out = Vector.newBuilder[(String, String, String, String, String)]
        var kind: String = null
        var field: String = null
        val fb = new StringBuilder
        var title = ""; var link = ""; var ts = ""; var uid = ""
        def reset(): Unit = { title = ""; link = ""; ts = ""; uid = "" }
        def fields = if (kind == "rss") rssFields else atomFields
        Tokenizer.tokenize(xml).foreach {
          case TStart("item", _, false) =>
            kind = "rss"; field = null; reset()
          case TStart("entry", _, false) =>
            kind = "atom"; field = null; reset()
          case TStart("link", attrs, _) if kind == "atom" =>
            val rel = attrs.getOrElse("rel", "alternate").trim
            if (link.isEmpty && rel == "alternate")
              link = attrs.getOrElse("href", "").trim
          case TStart(n, _, false) if kind != null && fields(n) =>
            field = n; fb.clear()
          case TEnd(n) if n == field =>
            val v = fb.toString.trim
            field match {
              case "title"             => title = v
              case "link"              => link = v
              case "pubdate" | "updated" => ts = v
              case "guid" | "id"       => uid = v
            }
            field = null
          case TEnd(n) if kind != null &&
              ((kind == "rss" && n == "item") ||
               (kind == "atom" && n == "entry")) =>
            if (link.nonEmpty) out += ((kind, title, link, ts, uid))
            kind = null; field = null
          case TText(t) => if (field != null) fb.append(t)
          case _        => ()
        }
        out.result().iterator.zipWithIndex.map { case ((k, t, l, p, u), i) =>
          (id, i.toLong, k, t, l, p, u)
        }
      }
      .toDF(idCol, "entry_no", "kind", "title", "link", "ts", "uid")
  }
}
