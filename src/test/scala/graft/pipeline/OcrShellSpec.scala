package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

/** ShellOcrEngine plumbing against stub executables standing in for
  * pdftoppm/tesseract: the process spawn, temp-dir lifecycle, page-range
  * flags, numeric (not lexicographic) page ordering, PNG IHDR dimension
  * parse, and the None-on-failure contract are all real — only the pixels
  * are fake (no poppler/tesseract offline; GRAFT_PDFTOPPM/GRAFT_TESSERACT
  * point at the real binaries in deployment).
  */
class OcrShellSpec extends AnyFunSuite {

  private def script(dir: Path, name: String, body: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, s"#!/bin/sh\n$body")
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p.toString
  }

  /** Minimal PNG: signature + IHDR with the given dims (CRC bytes zeroed —
    * the engine reads the header, it does not decode pixels).
    */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(Array(0, 0, 0, 13).map(_.toByte)) // IHDR length
    out.write("IHDR".getBytes(UTF_8))
    def u32(v: Int) = out.write(Array(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff).map(_.toByte))
    u32(w); u32(h)
    out.write(Array(8, 2, 0, 0, 0).map(_.toByte)) // bit depth etc.
    u32(0) // CRC (unchecked)
    out.toByteArray
  }

  private def stubs(dir: Path, pages: Int): (String, String) = {
    // stage PNG fixtures the pdftoppm stub copies into its cwd
    (1 to pages).foreach { p =>
      Files.write(dir.resolve(s"fixture-$p.png"), pngBytes(2550, 3300))
    }
    // pdftoppm stub: honors -f/-l single-page selection and the
    // <prefix>-<n>.png naming; ignores -r/-png/input
    val toppm = script(dir, "pdftoppm",
      s"""first=1; last=$pages
         |while [ $$# -gt 0 ]; do
         |  case "$$1" in
         |    -f) first=$$2; shift 2;;
         |    -l) last=$$2; shift 2;;
         |    -r|-png) shift; [ "$$1" = "300" ] && shift;;
         |    *) prefix="$$1"; shift;;
         |  esac
         |done
         |p=$$first
         |while [ $$p -le $$last ]; do
         |  cp "$dir/fixture-$$p.png" "page-$$p.png" || exit 1
         |  p=$$((p+1))
         |done""".stripMargin)
    // tesseract stub: "recognizes" text derived from the image name
    val tess = script(dir, "tesseract",
      """echo "recognized $1"""")
    (toppm, tess)
  }

  test("ocrDocument: rasterize all pages, recognize each, IHDR dims") {
    val dir = Files.createTempDirectory("ocrshell")
    val (toppm, tess) = stubs(dir, pages = 3)
    val engine = new ShellOcrEngine(toppm, tess)
    val got = engine.ocrDocument("%PDF-1.4 fake".getBytes(UTF_8))
    assert(got.isDefined)
    assert(got.get.map(_.text.trim) ==
      Vector("recognized page-1.png", "recognized page-2.png", "recognized page-3.png"))
    assert(got.get.forall(p => p.width == 2550.0 && p.height == 3300.0))
  }

  test("ocrDocument orders pages numerically past 9 (poppler naming)") {
    val dir = Files.createTempDirectory("ocrshell")
    val (toppm, tess) = stubs(dir, pages = 12)
    val got = new ShellOcrEngine(toppm, tess).ocrDocument(Array[Byte](1))
    assert(got.get.map(_.text.trim) == (1 to 12).map(p => s"recognized page-$p.png"))
  }

  test("ocrPage: -f/-l single-page rasterization") {
    val dir = Files.createTempDirectory("ocrshell")
    val (toppm, tess) = stubs(dir, pages = 5)
    val got = new ShellOcrEngine(toppm, tess).ocrPage(Array[Byte](1), 4L)
    assert(got.map(_.trim).contains("recognized page-4.png"))
  }

  test("nonzero exit / missing binary -> None (caller falls back to text layer)") {
    val dir = Files.createTempDirectory("ocrshell")
    val bad = script(dir, "pdftoppm", "exit 1")
    val tess = script(dir, "tesseract", "echo x")
    assert(new ShellOcrEngine(bad, tess).ocrDocument(Array[Byte](1)).isEmpty)
    assert(new ShellOcrEngine(bad, tess).ocrPage(Array[Byte](1), 1L).isEmpty)
    assert(new ShellOcrEngine(dir.resolve("nope").toString, tess)
      .ocrDocument(Array[Byte](1)).isEmpty)
    // rasterize ok but recognize fails -> None
    val (toppm, _) = stubs(dir, pages = 2)
    val badTess = script(dir, "tess_bad", "exit 2")
    assert(new ShellOcrEngine(toppm, badTess).ocrDocument(Array[Byte](1)).isEmpty)
  }

  test("engine registry: 'shell' resolves from env-or-PATH names") {
    val e = Ocr.engine("shell")
    assert(e.isDefined && e.get.isInstanceOf[ShellOcrEngine])
  }
}
