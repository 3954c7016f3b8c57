package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.html.{Tokenizer, TEnd, TStart, TText}

/** Head-metadata harvesting from raw HTML: `<title>`, `<meta
  * name=description>`, `<meta name=robots>` directives, `<link
  * rel=canonical>`, `<html lang>` and OpenGraph `og:title` — the per-page
  * signals a crawl pipeline reads BEFORE extraction (index/dedup keys,
  * language routing, canonical-URL collapse, robots compliance per
  * HTML-spec `<meta name=robots>` semantics; reference scope is per-document
  * content only — `/root/reference/extractor/extractors/` — so this is
  * additive web-scale surface like [[WebGraph]]).
  *
  * Parsing rides the library's own streaming tokenizer ([[Tokenizer]] —
  * case-folded tag/attr names, both quote styles, entity-decoded attribute
  * values; regex scraping gets all of these wrong). Rules, first-wins like
  * browsers:
  *
  *  - `lang`: the first `<html>` start tag's `lang` attribute, trimmed.
  *  - `title`: text tokens after the FIRST `<title>` start tag up to the
  *    next tag token (any start or end tag terminates the run — the
  *    well-formed case ends at `</title>`), entity-decoded by the
  *    tokenizer, whitespace collapsed and trimmed. Later titles ignored.
  *  - `description` / `og_title`: `content` of the first `<meta>` whose
  *    `name` (resp. `property`) equals `description` (resp. `og:title`)
  *    case-insensitively after trim.
  *  - `noindex`/`nofollow`: from the first `<meta name=robots>`: content
  *    splits on commas into trimmed lowercase tokens; `none` implies both
  *    (robots-meta convention).
  *  - `canonical`: `href` of the first `<link>` whose `rel` — a
  *    space-separated token list per the HTML spec — contains the token
  *    `canonical` case-insensitively.
  *
  * Absent string fields surface as '' (not null) so downstream grouping and
  * cross-engine comparison need no null-order convention. Plan: narrow
  * scan-stage map (the sanctioned tokenizer region), one output row per
  * input row, no exchange — at 10^12 pages this costs exactly one pass
  * that fuses with whatever scan feeds it.
  */
object PageMeta {

  private def collapse(sb: StringBuilder): String =
    sb.toString.trim.replaceAll("\\s+", " ")

  def extract(df: DataFrame, idCol: String = "doc_id",
              urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(urlCol).cast("string"),
        col(htmlCol).cast("string"))
      .as[(Long, String, String)]
      .map { case (id, url, html) =>
        var lang: String = null
        var title: String = null
        var desc: String = null
        var robots: String = null
        var canon: String = null
        var ogTitle: String = null
        var inTitle = false
        val tb = new StringBuilder

        def endTitle(): Unit =
          if (inTitle) { title = collapse(tb); inTitle = false }

        Tokenizer.tokenize(html).foreach {
          case TStart(name, attrs, selfClosing) =>
            endTitle() // any tag token terminates a running title capture
            name match {
              case "html" =>
                if (lang == null)
                  lang = attrs.get("lang").map(_.trim).orNull
              case "title" =>
                if (title == null && !selfClosing) { inTitle = true; tb.clear() }
              case "meta" =>
                val nm = attrs.get("name").map(_.trim.toLowerCase).getOrElse("")
                val prop = attrs.get("property").map(_.trim.toLowerCase).getOrElse("")
                lazy val content = attrs.getOrElse("content", "")
                if (nm == "description" && desc == null) desc = content
                if (nm == "robots" && robots == null) robots = content
                if (prop == "og:title" && ogTitle == null) ogTitle = content
              case "link" =>
                val rel = attrs.get("rel")
                  .map(_.trim.toLowerCase.split("\\s+").toSet)
                  .getOrElse(Set.empty[String])
                if (rel("canonical") && canon == null)
                  canon = attrs.getOrElse("href", null)
              case _ => ()
            }
          case TEnd(_)   => endTitle()
          case TText(t)  => if (inTitle) tb.append(t)
          case _         => ()
        }
        endTitle() // unterminated title runs to end-of-document

        val robotTokens =
          if (robots == null) Set.empty[String]
          else robots.split(',').iterator.map(_.trim.toLowerCase)
            .filter(_.nonEmpty).toSet
        def nvl(s: String) = if (s == null) "" else s
        (id, url, nvl(title), nvl(desc), nvl(canon), nvl(lang), nvl(ogTitle),
          robotTokens("noindex") || robotTokens("none"),
          robotTokens("nofollow") || robotTokens("none"))
      }
      .toDF(idCol, urlCol, "title", "description", "canonical", "lang",
        "og_title", "noindex", "nofollow")
  }
}
