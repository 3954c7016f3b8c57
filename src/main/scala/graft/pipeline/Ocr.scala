package graft.pipeline

import java.nio.charset.StandardCharsets
import java.util.Base64

/** One OCR'd page: recognized text plus the raster dimensions of the page
  * image (the reference records image.width/height from the 300-dpi
  * rasterization, pdf_text_extractor.py:289-341 `_extract_with_ocr`).
  */
final case class OcrPage(text: String, width: Double, height: Double)

/** The OCR seam of the PDF decode path — the reference's pytesseract calls
  * behind a pluggable engine, mirroring the `LlmParser` seam (the other
  * optional external dependency). Two entry points because the reference
  * has two distinct OCR flows:
  *
  *  - `ocrPage`: the per-page AUTO-OCR fallback inside regular extraction
  *    (pdf_text_extractor.py:219-237): when the document was detected as
  *    image-based and a page's extracted text is short, OCR just that page
  *    and keep the OCR text only if it is strictly longer (stripped).
  *  - `ocrDocument`: the explicit use_ocr mode (pdf_text_extractor.py:
  *    289-341 `_extract_with_ocr`): rasterize every page and OCR it;
  *    page dims come from the images. Any failure → the caller falls back
  *    to regular extraction (pdf_text_extractor.py:83-96).
  *
  * Offline there is no tesseract (sandbox), so the default is
  * `Option[OcrEngine] = None` everywhere — identical to the reference when
  * pytesseract/poppler are missing (`_ocr_available` false): the flag and
  * metrics plumbing still run, pages keep whatever text the parser found.
  */
trait OcrEngine extends Serializable {
  def ocrPage(pdf: Array[Byte], pageNum: Long): Option[String]
  def ocrDocument(pdf: Array[Byte]): Option[Vector[OcrPage]]
}

/** Deterministic offline stand-in: "recognizes" text carried by `%%OCR`
  * comment lines embedded in the PDF bytes (PDF comments are ignored by
  * any conforming reader, including graft.pdf.Pdf — they stand in for the
  * pixels a real scanner sees but the text layer lacks). Line format:
  * `%%OCR <page_num> <base64(utf8 text)>`. Raster dims are the 300-dpi
  * letter-page constants (8.5x11in → 2550x3300), matching the reference's
  * dpi=300 conversion.
  */
object FakeOcrEngine extends OcrEngine {
  val RasterW = 2550.0
  val RasterH = 3300.0

  private def sidecar(pdf: Array[Byte]): Map[Long, String] = {
    val s = new String(pdf, StandardCharsets.ISO_8859_1) // byte-preserving
    val out = Map.newBuilder[Long, String]
    var i = 0
    while (i >= 0 && i < s.length) {
      val j = s.indexOf("%%OCR ", i)
      if (j < 0) i = -1
      else {
        val eol = s.indexOf('\n', j) match { case -1 => s.length; case e => e }
        val parts = s.substring(j + 6, eol).trim.split(" ", 2)
        if (parts.length == 2 && parts(0).forall(_.isDigit))
          out += parts(0).toLong ->
            new String(Base64.getDecoder.decode(parts(1)), StandardCharsets.UTF_8)
        i = eol
      }
    }
    out.result()
  }

  override def ocrPage(pdf: Array[Byte], pageNum: Long): Option[String] =
    sidecar(pdf).get(pageNum)

  override def ocrDocument(pdf: Array[Byte]): Option[Vector[OcrPage]] = {
    val pages = sidecar(pdf)
    if (pages.isEmpty) None
    else Some(pages.toVector.sortBy(_._1).map { case (_, t) => OcrPage(t, RasterW, RasterH) })
  }
}

object Ocr {
  /** Embed `%%OCR` sidecar comment lines into a PDF, right after the
    * header line — fixture helper for building "scanned" test documents
    * (a real scanned PDF carries the text in pixels; the fake engine reads
    * it from these comments instead).
    */
  def embedSidecar(pdf: Array[Byte], pages: Seq[(Long, String)]): Array[Byte] = {
    val nl = pdf.indexOf('\n'.toByte) match {
      case -1 => sys.error("not a PDF: no header line")
      case n  => n + 1
    }
    val block = pages.map { case (num, text) =>
      s"%%OCR $num ${Base64.getEncoder.encodeToString(text.getBytes(StandardCharsets.UTF_8))}\n"
    }.mkString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](pdf.length + block.length)
    System.arraycopy(pdf, 0, out, 0, nl)
    System.arraycopy(block, 0, out, nl, block.length)
    System.arraycopy(pdf, nl, out, nl + block.length, pdf.length - nl)
    out
  }

  /** Engine registry keyed by config string (mirrors Config.secondSource /
    * llmParser): "none" → no engine (production offline default), "fake" →
    * the deterministic sidecar engine, "shell" → the real
    * pdftoppm+tesseract binding (paths from GRAFT_PDFTOPPM /
    * GRAFT_TESSERACT, defaulting to the bare binary names on PATH) — pure
    * deployment config, no code edit to go live.
    */
  def engine(name: String): Option[OcrEngine] = name match {
    case "none" => None
    case "fake" => Some(FakeOcrEngine)
    case "shell" => Some(new ShellOcrEngine(
      sys.env.getOrElse("GRAFT_PDFTOPPM", "pdftoppm"),
      sys.env.getOrElse("GRAFT_TESSERACT", "tesseract")))
    case other  => sys.error(s"unknown ocr engine '$other' (none|fake|shell)")
  }
}
