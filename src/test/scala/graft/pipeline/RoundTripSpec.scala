package graft.pipeline

import graft.core.Assemble
import graft.fixtures.{CorpusIO, PayloadGen}
import org.scalatest.funsuite.AnyFunSuite

/** The payload encoders and the engine's decoders must round-trip every
  * corpus document: decode(encode(doc)) == doc.pages (texts, tables,
  * width/height), hence extraction output stays byte-golden.
  */
class RoundTripSpec extends AnyFunSuite {

  private lazy val docs = CorpusIO.load()

  /** Scanned docs decode through the OCR seam (the reference with
    * pytesseract available); everything else with the default no-engine
    * path. */
  private def engineFor(d: graft.fixtures.CorpusDoc): Option[OcrEngine] =
    if (d.ocr) Some(FakeOcrEngine) else None

  test("payload decode reproduces corpus pages byte-identically") {
    var checked = 0
    docs.foreach { d =>
      val (_, _, html, text, _) = PayloadGen.row(d)
      val dec = Decode.decode(html, text, engineFor(d), useOcr = false)
      assert(dec.error.isEmpty, s"${d.url}: ${dec.error}")
      assert(dec.pages.length == d.pages.length, s"${d.url}: page count ${dec.pages.length} != ${d.pages.length}")
      dec.pages.zip(d.pages).foreach { case (got, want) =>
        assert(got.text == want.text,
          s"${d.url} [${d.payload}] page ${want.pageNum} text mismatch:\nwant: ${want.text.take(200)}\ngot:  ${got.text.take(200)}")
        assert(got.tables == want.tables, s"${d.url} page ${want.pageNum} tables mismatch")
        assert(got.width == want.width && got.height == want.height, s"${d.url} dims mismatch")
      }
      checked += 1
    }
    assert(checked == docs.length)
  }

  test("decoded pages reproduce golden JSON byte-identically") {
    val goldenDir = java.nio.file.Paths.get(
      Seq("src/test/resources/golden", "/root/repo/src/test/resources/golden")
        .find(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))).get)
    docs.foreach { d =>
      val (_, _, html, text, _) = PayloadGen.row(d)
      val dec = Decode.decode(html, text, engineFor(d), useOcr = false)
      val actual = Assemble.renderDocument(dec.pages, d.mode)
      val expected = new String(java.nio.file.Files.readAllBytes(
        goldenDir.resolve(CorpusIO.docId(d.url) + ".json")), java.nio.charset.StandardCharsets.UTF_8)
      assert(actual == expected, s"${d.url} [${d.payload}/${d.mode}] golden mismatch")
    }
  }

  test("every payload kind emits spans addressing the extracted text") {
    docs.foreach { d =>
      val (_, _, html, text, _) = PayloadGen.row(d)
      val row = Extract.parseRow(d.url, html, text, 0, d.mode, ocr = engineFor(d))
      val t = row.extracted_text
      assert(row.spans.nonEmpty == t.nonEmpty || row.n_pages > 0, s"${d.url}: no spans")
      row.spans.foreach { s =>
        assert(s.start >= 0 && s.start <= s.end && s.end <= t.length,
          s"${d.url} [${d.payload}] bad span $s for text of ${t.length}")
      }
      if (d.payload != "html") {
        // page spans: substring at each span equals that page's text
        assert(row.spans.length == d.pages.length)
        row.spans.zip(d.pages).foreach { case (s, p) =>
          assert(t.substring(s.start.toInt, s.end.toInt) == p.text,
            s"${d.url} page-span text mismatch")
          assert(s.kind == "page")
        }
      }
    }
  }

  test("html spans address the emitted text") {
    docs.filter(_.payload == "html").foreach { d =>
      val (_, _, html, _, _) = PayloadGen.row(d)
      val dec = Decode.decode(html, null)
      val t = dec.pages.head.text
      var prevEnd = -1L
      dec.spans.foreach { s =>
        assert(s.start >= 0 && s.end <= t.length && s.start <= s.end, s"${d.url} bad span $s")
        assert(s.start > prevEnd || prevEnd == -1L, s"${d.url} overlapping span $s")
        prevEnd = s.end
      }
      // spans cover every line block: reassembling span texts equals the text
      val reassembled = dec.spans.map(s => t.substring(s.start.toInt, s.end.toInt)).mkString("\n")
      assert(reassembled == t, s"${d.url} span reassembly mismatch")
    }
  }
}
