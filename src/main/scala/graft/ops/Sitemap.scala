package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.html.{Tokenizer, TEnd, TStart, TText}

/** Sitemap parsing (sitemaps.org protocol 0.9): turn fetched `sitemap.xml`
  * payloads into frontier-seed rows — the crawl-discovery complement to
  * [[Robots]] (which gates) and the frontier scheduler (which orders).
  * Handles both document kinds in one pass: `<urlset>` entries (kind
  * `url`: loc, lastmod, changefreq, priority) and `<sitemapindex>` entries
  * (kind `sitemap`: loc, lastmod — the recursive fan-out a crawler feeds
  * back into its fetch queue).
  *
  * The XML is lexed by the library's streaming [[Tokenizer]] — sitemap XML
  * is tag-regular so the HTML lexer is sound for it, and it gives entity
  * decoding (`&amp;` in query-string locs is mandatory escaping per the
  * protocol) for free. Rules:
  *
  *  - an entry opens at `<url>`/`<sitemap>` and emits at its close tag;
  *  - `<loc>`, `<lastmod>`, `<changefreq>`, `<priority>` capture their
  *    text content (trimmed; the protocol allows surrounding whitespace);
  *  - entries without a non-empty `<loc>` are dropped (loc is the one
  *    REQUIRED field); absent optional fields surface as '';
  *  - `priority`/`lastmod` stay strings — the parse is the contract,
  *    numeric/temporal interpretation is the caller's cast;
  *  - `entry_no` numbers the EMITTED entries of a document in document
  *    order.
  *
  * Plan: narrow scan-stage flatMap (the sanctioned tokenizer region), no
  * exchange; at fleet scale sitemap files are small and numerous, so the
  * parallelism unit is the row exactly like every other page payload.
  */
object Sitemap {

  private val containers = Set("url", "sitemap")
  private val fields = Set("loc", "lastmod", "changefreq", "priority")

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
        var loc = ""; var lastmod = ""; var changefreq = ""; var priority = ""
        def reset(): Unit = { loc = ""; lastmod = ""; changefreq = ""; priority = "" }
        Tokenizer.tokenize(xml).foreach {
          case TStart(n, _, false) if containers(n) =>
            kind = n; field = null; reset()
          case TStart(n, _, false) if fields(n) && kind != null =>
            field = n; fb.clear()
          case TEnd(n) if n == field =>
            val v = fb.toString.trim
            field match {
              case "loc"        => loc = v
              case "lastmod"    => lastmod = v
              case "changefreq" => changefreq = v
              case "priority"   => priority = v
            }
            field = null
          case TEnd(n) if containers(n) && n == kind =>
            if (loc.nonEmpty) out += ((kind, loc, lastmod, changefreq, priority))
            kind = null; field = null
          case TText(t) => if (field != null) fb.append(t)
          case _        => ()
        }
        out.result().iterator.zipWithIndex.map { case ((k, l, m, c, p), i) =>
          (id, i.toLong, k, l, m, c, p)
        }
      }
      .toDF(idCol, "entry_no", "kind", "loc", "lastmod", "changefreq",
        "priority")
  }
}
