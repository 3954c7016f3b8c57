package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Comparator
import scala.util.control.NonFatal

/** Real OCR binding behind the [[OcrEngine]] seam: shell out to poppler's
  * `pdftoppm` (rasterize, 300 dpi — the reference's pdf2image call,
  * /root/reference/extractor/extractors/pdf_text_extractor.py:289-341 uses
  * poppler the same way) and to `tesseract` (recognize, stdout) — the exact
  * external tools pytesseract/pdf2image wrap. Selected via
  * `Extract.Config(ocrEngine = "shell")`, with binary paths overridable
  * through GRAFT_PDFTOPPM / GRAFT_TESSERACT (see [[Ocr.engine]]); the
  * offline default everywhere stays "none".
  *
  * Failure contract mirrors the reference's try/except: any nonzero exit,
  * timeout, or missing output → None, and the caller keeps the text layer
  * (pdf_text_extractor.py:83-96 falls back to regular extraction).
  *
  * Scale notes: runs per-task on the executor, one document at a time, temp
  * files under java.io.tmpdir cleaned in finally — the process spawn is the
  * cost of a real OCR engine and is embarrassingly parallel across
  * partitions; nothing touches the driver.
  */
final class ShellOcrEngine(pdftoppm: String, tesseract: String,
                           dpi: Int = 300, timeoutSec: Long = 120)
    extends OcrEngine {

  /** stdout goes to a temp FILE and stderr is discarded: tesseract writes
    * warnings to stderr, and an unread pipe fills and deadlocks the child;
    * a file sink also lets waitFor's timeout actually fire (a blocking
    * readAllBytes on the stdout pipe would hang before the timeout).
    */
  private def run(cmd: Seq[String], cwd: Path): Option[String] = {
    val outF = Files.createTempFile(cwd, ".out", ".txt")
    try {
      val pb = new ProcessBuilder(cmd: _*)
      pb.directory(cwd.toFile)
      pb.redirectOutput(outF.toFile)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val p = pb.start()
      p.getOutputStream.close()
      if (!p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly(); None
      } else if (p.exitValue() != 0) None
      else Some(new String(Files.readAllBytes(outF), StandardCharsets.UTF_8))
    } finally Files.deleteIfExists(outF)
  }

  /** PNG raster dimensions straight from the IHDR chunk (bytes 16-23,
    * big-endian u32 pair) — the reference records image.width/height from
    * the rasterization, and reading 24 header bytes beats decoding pixels.
    */
  private def pngDims(png: Path): Option[(Double, Double)] = {
    val in = Files.newInputStream(png)
    try {
      val head = in.readNBytes(24)
      if (head.length < 24 || head(1) != 'P' || head(2) != 'N' || head(3) != 'G') None
      else {
        def u32(o: Int): Long =
          ((head(o) & 0xffL) << 24) | ((head(o + 1) & 0xffL) << 16) |
            ((head(o + 2) & 0xffL) << 8) | (head(o + 3) & 0xffL)
        Some((u32(16).toDouble, u32(20).toDouble))
      }
    } finally in.close()
  }

  private def withTempDir[A](f: Path => Option[A]): Option[A] = {
    val dir = Files.createTempDirectory("graft_ocr")
    try f(dir)
    catch { case NonFatal(_) => None }
    finally {
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  /** Page number from a pdftoppm output name `<prefix>-<n>.png` (poppler
    * zero-pads by page count, so lexicographic order is NOT numeric order
    * past 9 pages — parse the number).
    */
  private def pageOf(p: Path): Long = {
    val n = p.getFileName.toString.stripSuffix(".png")
    n.substring(n.lastIndexOf('-') + 1).toLong
  }

  private def rasterize(dir: Path, pdf: Array[Byte],
                        pageRange: Option[Long]): Option[Vector[Path]] = {
    val in = dir.resolve("in.pdf")
    Files.write(in, pdf)
    val range = pageRange.toSeq.flatMap(p => Seq("-f", p.toString, "-l", p.toString))
    run(Seq(pdftoppm, "-r", dpi.toString, "-png") ++ range ++
      Seq("in.pdf", "page"), dir).flatMap { _ =>
      val pngs = Files.list(dir).iterator()
      val out = Vector.newBuilder[Path]
      while (pngs.hasNext) {
        val p = pngs.next()
        if (p.getFileName.toString.endsWith(".png")) out += p
      }
      val sorted = out.result().sortBy(pageOf)
      if (sorted.isEmpty) None else Some(sorted)
    }
  }

  private def recognize(dir: Path, png: Path): Option[String] =
    run(Seq(tesseract, png.getFileName.toString, "stdout"), dir)

  override def ocrPage(pdf: Array[Byte], pageNum: Long): Option[String] =
    withTempDir { dir =>
      rasterize(dir, pdf, Some(pageNum))
        .flatMap(_.headOption)
        .flatMap(recognize(dir, _))
    }

  override def ocrDocument(pdf: Array[Byte]): Option[Vector[OcrPage]] =
    withTempDir { dir =>
      rasterize(dir, pdf, None).flatMap { pngs =>
        val pages = Vector.newBuilder[OcrPage]
        var ok = true
        pngs.foreach { png =>
          if (ok) (recognize(dir, png), pngDims(png)) match {
            case (Some(text), Some((w, h))) => pages += OcrPage(text, w, h)
            case _                          => ok = false
          }
        }
        if (ok) Some(pages.result()) else None // any page failing fails the doc (reference try/except granularity)
      }
    }
}
