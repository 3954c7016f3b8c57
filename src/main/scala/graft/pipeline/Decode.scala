package graft.pipeline

import graft.core.{PageData, PyStr}
import graft.html.{Boilerplate, Span}
import graft.pdf.{Layout, Pdf}

import java.nio.charset.StandardCharsets

/** Payload routing + decode: one row of the `pages` table → the reference's
  * pages_data (≙ PDFTextExtractor.extract_text,
  * /root/reference/extractor/extractors/pdf_text_extractor.py:58-217).
  * Routed by magic bytes: %PDF- → content-stream parse; else HTML; `text`
  * column → pre-decoded pages split on \f. Never throws: malformed payloads
  * pass through as zero pages + an error tag (mirroring the reference's
  * fallback-not-fail behavior, pdf_text_extractor.py:75-98,195-198).
  */
object Decode {

  /** UTF-8 byte length without materializing the encoded array — bytesIn
    * is a metric; `text.length` counted UTF-16 units (chars), skewing
    * byte-volume metrics for non-ASCII payloads.
    */
  private[pipeline] def utf8Len(s: String): Long = {
    var b = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      b += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
      i += Character.charCount(cp)
    }
    b
  }

  final case class Decoded(
      pages: Vector[PageData],
      kind: String,                 // pdf | html | text | none
      spans: Vector[Span],          // html block spans; page spans otherwise
      bytesIn: Long,
      charsOut: Long,
      needsOcr: Boolean,            // O2: first-page text < 50 chars
      error: Option[String]
  )

  def decode(html: Array[Byte], text: String): Decoded = {
    val (pages, kind, spans0, bytesIn, err) =
      if (html != null && Pdf.isPdf(html)) {
        try {
          val parsed = Pdf.parse(html)
          val ps = parsed.zipWithIndex.map { case (p, i) =>
            // ruled-grid cells are table structure, not page text
            val (tables, textRuns) = Pdf.splitTables(p)
            val text = Layout.pageText(textRuns)
            // O3 gate — table-indicator predicate, mirroring the reference
            // (pdf_text_extractor.py:167-182): '\t' present, >15 '|', or
            // >8 '│'. The reference gates because pdfplumber's extraction
            // is slow; we keep the same *semantics* so gated pages match.
            // The predicate input is the FULL page text (all runs, before
            // table-cell runs are split out): the reference evaluates it on
            // page.extract_text(), which includes cell text — gating on the
            // post-split text would diverge on real PDFs whose indicator
            // characters live inside the grid.
            val gateText = Layout.pageText(p.runs)
            val gate = gateText.contains('\t') ||
              gateText.count(_ == '|') > 15 || gateText.count(_ == '│') > 8
            PageData(i + 1L, text, Some(p.width), Some(p.height),
              if (gate) tables else Nil)
          }
          (ps, "pdf", Vector.empty[Span], html.length.toLong, None)
        } catch {
          case e: Exception =>
            (Vector.empty[PageData], "pdf", Vector.empty[Span], html.length.toLong,
              Some(s"pdf-parse: ${e.getMessage}"))
        }
      } else if (html != null) {
        try {
          val ex = Boilerplate.extract(new String(html, StandardCharsets.UTF_8))
          val tables: Seq[Seq[Seq[Option[String]]]] = ex.tables
          (Vector(PageData(1L, ex.text, None, None, tables)), "html", ex.spans,
            html.length.toLong, None)
        } catch {
          case e: Exception =>
            (Vector.empty[PageData], "html", Vector.empty[Span], html.length.toLong,
              Some(s"html-parse: ${e.getMessage}"))
        }
      } else if (text != null) {
        val ps = PyStr.split(text, '\f').toVector.zipWithIndex.map { case (t, i) =>
          PageData(i + 1L, t, None, None, Nil)
        }
        (ps, "text", Vector.empty[Span], utf8Len(text), None)
      } else {
        (Vector.empty[PageData], "none", Vector.empty[Span], 0L, Some("null payload"))
      }

    // page-level spans for non-html payloads: offsets into '\n\n'-combined text
    val spans =
      if (spans0.nonEmpty || pages.isEmpty) spans0
      else {
        var off = 0L
        pages.map { p =>
          val start = off
          off += p.text.length
          val s = Span(start, off, "page")
          off += 2 // the "\n\n" joiner
          s
        }
      }

    val charsOut = pages.map(_.text.length.toLong).sum
    val needsOcr = pages.headOption.exists(p => PyStr.len(PyStr.strip(p.text)) < 50)
    Decoded(pages, kind, spans, bytesIn, charsOut, needsOcr, err)
  }
}
