package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** Font text decode (round 5): simple fonts with /Encoding /Differences
  * (AGL + uniXXXX glyph names) and /ToUnicode bfchar CMaps, and Type0/CID
  * fonts with 2-byte Identity-H codes through /ToUnicode bfrange+bfchar —
  * the reference gets this from pdfplumber's char mapping
  * (pdf_text_extractor.py:146); we decode per-font at tokenize time.
  */
class PdfFontSpec extends AnyFunSuite {

  private val pages = Seq(
    Seq("plain ascii first line",
        "accents: déjà vu über naïve çédille",
        "typography: “quotes” — dash • bullet … ellipsis",
        "mixed: price €42, ±3°, ½ off"),
    Seq("second page: 中文 and ελληνικά",
        "back to ascii"))

  private def parsedText(bytes: Array[Byte]): Vector[String] =
    Pdf.parse(bytes).map(p => Layout.pageText(p.runs))

  private val expected: Vector[String] = pages.map(_.mkString("\n")).toVector

  test("simple font: /Differences + /ToUnicode round-trips byte-identically") {
    val bytes = Pdf.writeCustomFontDoc(pages, cid = false)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("/Differences") && s.contains("beginbfchar"))
    // the payload genuinely does NOT carry UTF-8 text: the accented chars
    // must not appear as UTF-8 byte sequences anywhere in the file
    assert(!s.contains(new String("déjà".getBytes(StandardCharsets.UTF_8),
      StandardCharsets.ISO_8859_1)))
    assert(parsedText(bytes) == expected)
  }

  test("CID font: Identity-H 2-byte codes through bfrange + bfchar") {
    val bytes = Pdf.writeCustomFontDoc(pages, cid = true)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("/Subtype /Type0") && s.contains("/Identity-H"))
    assert(s.contains("beginbfrange"), "sorted-char assignment should produce at least one range")
    // no literal strings at all: every glyph rides a hex string
    assert(!s.contains("ascii first line"))
    assert(parsedText(bytes) == expected)
  }

  test("glyph-name decode: AGL names and uniXXXX forms") {
    // hand-built /Differences exercising named glyphs explicitly
    val content = "BT /F1 10 Tf 1 0 0 1 50 760 Tm (caf  X) Tj ET\n"
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /T " +
      "/Encoding << /Differences [128 /eacute /bullet /uni4E2D] >> >>"
    val objs = Vector(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n",
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n",
      s"5 0 obj\n$font\nendobj\n")
    val body = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { o => val off = body.length; body ++= o; off }
    val xref = body.length
    body ++= "xref\n0 1\n0000000000 65535 f \n"
    objs.zip(offsets).foreach { case (o, off) =>
      body ++= s"${o.takeWhile(_.isDigit)} 1\n" + f"$off%010d 00000 n \n"
    }
    body ++= s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n"
    val pdf = body.toString.getBytes(StandardCharsets.ISO_8859_1)
    assert(parsedText(pdf) == Vector("café • 中X"))
  }

  test("WinAnsi base: cp1252 0x80-0x9F specials decode when only ToUnicode triggers the table") {
    // a font whose /ToUnicode covers ONE code — everything else falls to the
    // WinAnsi base table, including the cp1252 window
    val cmap = "1 beginbfchar\n<FF> <0041>\nendbfchar\n"
    val content = "BT /F1 10 Tf 1 0 0 1 50 760 Tm (win  ÿ) Tj ET\n"
    val objs = Vector(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n",
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n",
      s"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /T /ToUnicode 6 0 R >>\nendobj\n",
      s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
    val body = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { o => val off = body.length; body ++= o; off }
    val xref = body.length
    body ++= "xref\n0 1\n0000000000 65535 f \n"
    objs.zip(offsets).foreach { case (o, off) =>
      body ++= s"${o.takeWhile(_.isDigit)} 1\n" + f"$off%010d 00000 n \n"
    }
    body ++= s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n"
    val pdf = body.toString.getBytes(StandardCharsets.ISO_8859_1)
    assert(parsedText(pdf) == Vector("“win” • A"))
  }

  test("fixture fonts without Differences/ToUnicode keep the raw-UTF-8 contract") {
    val doc = Seq(Pdf.PageSpec(Seq((50.0, 760.0, "déjà — plain writer"))))
    for (framing <- Seq(Pdf.Framing.Classic, Pdf.Framing.ObjStm)) {
      val got = parsedText(Pdf.writePages(doc, flate = true, framing = framing))
      assert(got == Vector("déjà — plain writer"))
    }
  }
}
