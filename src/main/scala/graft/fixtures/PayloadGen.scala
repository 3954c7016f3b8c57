package graft.fixtures

import graft.core.{PageData, PyStr}
import graft.html.Tokenizer
import graft.pdf.Pdf

import java.nio.charset.StandardCharsets

/** Encode corpus documents into raw payloads for the `pages` table
  * (url, warc_ts, html BINARY, text, lang — BASELINE.json input_hint).
  * Encoders are designed together with the extractors so the extracted
  * text round-trips byte-identically (goldens by construction, FIXTURES.md
  * §4–5):
  *  - text payload: pages joined with \f (form feed), no tables;
  *  - html payload: one page; each text line is a <p>, tables are <table>;
  *    boilerplate (nav/header/footer/sidebar/link-farm/script/comments)
  *    wraps the main <article>;
  *  - pdf payload: one content stream per page, one Tm+Tj per line;
  *    deterministic single- or two-column placement; optional Flate.
  */
object PayloadGen {

  /** Deterministic per-url variant selector (no wall clock / RNG). */
  private def variant(url: String, mod: Int): Int = {
    val h = url.foldLeft(7L)((a, c) => a * 31 + c)
    (((h % mod) + mod) % mod).toInt
  }

  def htmlPayload(doc: CorpusDoc): Array[Byte] = {
    val page = doc.pages.head
    val v = variant(doc.url, 4)
    val sb = new java.lang.StringBuilder(page.text.length * 2 + 2048)
    sb.append("<!DOCTYPE html><html><head><title>host page</title>")
    sb.append("<script>var trk=1;function f(){return 42;}</script>")
    sb.append("<style>.main{margin:0}</style></head><body>")
    sb.append("<header><h1>Example Site</h1><p>tagline boilerplate</p></header>")
    sb.append("<nav><a href=\"/\">Home</a><a href=\"/plans\">Plans</a><a href=\"/specs\">Specs</a><a href=\"/contact\">Contact</a></nav>")
    sb.append("<div class=\"sidebar\"><p>Subscribe to our newsletter today</p><a href=\"/promo\">Big promo</a></div>")
    sb.append("<!-- build 4711 fragment cached -->")
    sb.append("<article>")
    val lines = PyStr.split(page.text, '\n')
    val unclosedP = v == 2 // malformed case: final <p> never closed
    lines.zipWithIndex.foreach { case (line, i) =>
      if (unclosedP && i == lines.length - 1) {
        sb.append("<p>").append(Tokenizer.encode(line))
      } else {
        sb.append("<p>").append(Tokenizer.encode(line)).append("</p>")
      }
    }
    page.tables.foreach { t =>
      sb.append("<table>")
      t.foreach { row =>
        sb.append("<tr>")
        row.foreach {
          case Some(c) => sb.append("<td>").append(Tokenizer.encode(c)).append("</td>")
          case None    => sb.append("<td></td>")
        }
        sb.append("</tr>")
      }
      sb.append("</table>")
    }
    sb.append("</article>")
    if (v == 1) sb.append("</div>") // malformed case: stray close tag
    if (!unclosedP) {
      // link farm: dropped by link-density (> 0.33)
      sb.append("<div>more: <a href=\"/l1\">the full catalogue of parts</a>")
      sb.append("<a href=\"/l2\">installation services near you</a>")
      sb.append("<a href=\"/l3\">request a quotation online now</a></div>")
    }
    sb.append("<footer><p>Copyright 2024 Example Corp. All rights reserved.</p></footer>")
    sb.append("</body></html>")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  def pdfPayload(doc: CorpusDoc): Array[Byte] = {
    if (doc.ocr) return scannedPdfPayload(doc)
    val v = variant(doc.url, 2)
    val flate = variant(doc.url, 3) != 0
    // physical framing rotates per url (r5): classic xref table, xref
    // stream, predicted xref stream, /ObjStm — a real crawl slice is
    // mostly PDF 1.5+, so the fixture corpus must be too
    val framing = variant(doc.url, 4) match {
      case 0 => Pdf.Framing.Classic
      case 1 => Pdf.Framing.XrefStream
      case 2 => Pdf.Framing.XrefStreamPred
      case _ => Pdf.Framing.ObjStm
    }
    val pages = doc.pages.map { p =>
      val lines = PyStr.split(p.text, '\n')
      val placements =
        if (v == 1 && lines.length >= 6) {
          // two columns: first half left (x=50), second half right (x=330)
          val h = (lines.length + 1) / 2
          val left = lines.take(h).zipWithIndex.map { case (l, i) => (50.0, 760.0 - 12.0 * i, l) }
          val right = lines.drop(h).zipWithIndex.map { case (l, i) => (330.0, 760.0 - 12.0 * i, l) }
          (left ++ right).toSeq
        } else {
          lines.zipWithIndex.map { case (l, i) => (50.0, 760.0 - 12.0 * i, l) }.toSeq
        }
      // tables render as ruled grids + cell runs below the text block
      Pdf.PageSpec(placements, p.tables)
    }
    Pdf.writePages(pages, flate,
      width = doc.pages.head.width.getOrElse(612.0),
      height = doc.pages.head.height.getOrElse(792.0),
      framing = framing)
  }

  /** A "scanned" PDF: each page's text layer is a short stub run (the
    * stray header a scanner's OCR-less text layer typically carries —
    * nonempty and < 50 chars so the reference's image-based detection
    * fires, pdf_text_extractor.py:115-126), with the page's real text in
    * the `%%OCR` sidecar the fake engine recovers.
    */
  def scannedPdfPayload(doc: CorpusDoc): Array[Byte] = {
    val stubs = doc.pages.map(p =>
      Pdf.PageSpec(Seq((50.0, 760.0, s"[scan ${p.pageNum}]"))))
    val base = Pdf.writePages(stubs, flate = false,
      width = doc.pages.head.width.getOrElse(612.0),
      height = doc.pages.head.height.getOrElse(792.0))
    graft.pipeline.Ocr.embedSidecar(base, doc.pages.map(p => p.pageNum -> p.text))
  }

  def textPayload(doc: CorpusDoc): String =
    doc.pages.map(_.text).mkString("\f")

  /** The full pages-table row for a corpus doc:
    * (url, warc_ts epoch sec, html bytes | null, text | null, lang | null).
    */
  def row(doc: CorpusDoc): (String, Long, Array[Byte], String, String) = doc.payload match {
    case "html" => (doc.url, doc.warcTs, htmlPayload(doc), null, doc.lang.orNull)
    case "pdf"  => (doc.url, doc.warcTs, pdfPayload(doc), null, doc.lang.orNull)
    case _      => (doc.url, doc.warcTs, null, textPayload(doc), doc.lang.orNull)
  }
}
