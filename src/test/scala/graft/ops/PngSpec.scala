package graft.ops

import graft.media.{Png, PngFilter}
import org.scalatest.funsuite.AnyFunSuite

/** The real PNG codec behind the multimodal seam (round 5): encode/decode
  * round-trips across color types and filter choices, luma conversion,
  * palette decode, and the pixel-level dHash — including the perceptual
  * invariances (brightness shift, representation change) that are dHash's
  * reason to exist and that the r4 stub could not exercise.
  */
class PngSpec extends AnyFunSuite {

  private def mkGray(w: Int, h: Int, f: (Int, Int) => Int): Png.Gray =
    Png.Gray(w, h, Array.tabulate(w * h)(i => f(i % w, i / w) & 0xff))

  test("gray/RGB/RGBA encodings round-trip pixels exactly, any filter mix") {
    val img = mkGray(23, 17, (x, y) => (x * 31 + y * 57 + 11) % 256)
    for (ct <- Seq(0, 2, 6); ftSeed <- Seq(0, 1)) {
      val bytes = Png.encodeGrayAs(img, ct, y => (y + ftSeed) % 5)
      val back = Png.decode(bytes)
      assert(back.width == 23 && back.height == 17)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"colorType $ct ftSeed $ftSeed")
    }
  }

  test("RGB luma: (77R + 150G + 29B) >> 8") {
    val samples = Array(255, 0, 0, /**/ 0, 255, 0, /**/ 0, 0, 255, /**/ 10, 20, 30)
    val bytes = Png.encode(2, 2, 2, samples)
    val g = Png.decode(bytes)
    assert(g.pixels.toSeq == Seq(
      (77 * 255) >> 8, (150 * 255) >> 8, (29 * 255) >> 8,
      (77 * 10 + 150 * 20 + 29 * 30) >> 8))
  }

  test("palette PNG decodes through PLTE lookup") {
    // hand-built: 3-entry palette, 3x1 image, filter 0
    val out = new java.io.ByteArrayOutputStream()
    Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).foreach(out.write)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def w32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
      w32(data.length)
      val tb = ctype.getBytes("US-ASCII"); out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      w32(crc.getValue.toInt)
    }
    chunk("IHDR", Array[Byte](0, 0, 0, 3, 0, 0, 0, 1, 8, 3, 0, 0, 0))
    chunk("PLTE", Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 30, 60, 90))
    val d = new java.util.zip.Deflater()
    d.setInput(Array[Byte](0, 0, 1, 2)); d.finish() // filter 0 + indices 0,1,2
    val buf = new Array[Byte](64); val comp = new java.io.ByteArrayOutputStream()
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.empty)
    val g = Png.decode(out.toByteArray)
    assert(g.pixels.toSeq == Seq(
      (77 * 255) >> 8, (150 * 255) >> 8, (77 * 30 + 150 * 60 + 29 * 90) >> 8))
  }

  test("out-of-subset inputs fail loudly (16-bit, interlaced, truncated)") {
    val img = mkGray(8, 8, (x, y) => x * y)
    val good = Png.encodeGrayAs(img, 0)
    intercept[java.io.IOException](Png.decode(good.take(40)))
    val deep = good.clone; deep(24) = 16 // IHDR bit depth
    intercept[java.io.IOException](Png.decode(deep))
    val laced = good.clone; laced(28) = 1 // IHDR interlace
    intercept[java.io.IOException](Png.decode(laced))
    assert(!Png.isPng("not a png".getBytes))
  }

  test("dHashImage: 9x7 single-pixel cells reduce to direct comparisons") {
    val img = mkGray(9, 7, (x, y) => (x * 11 + y * 3) % 97)
    val h = Multimodal.dHashImage(img)
    (0 until 7).foreach { r =>
      (0 until 8).foreach { c =>
        val expected = img(c, r) > img(c + 1, r)
        assert(((h >> (r * 8 + c)) & 1L) == (if (expected) 1L else 0L), s"bit ($r,$c)")
      }
    }
    assert((h >>> 56) == 0L, "bits 56-63 must stay clear")
  }

  test("dHash invariances: brightness shift and representation change preserve the hash") {
    val base = mkGray(36, 28, (x, y) => 40 + (x * 5 + y * 7) % 100) // range 40..139
    val h0 = Multimodal.dHashImage(base)
    // brightness: +25 on every pixel (no clamping in range) → same gradients
    val brighter = Png.Gray(36, 28, base.pixels.map(_ + 25))
    assert(Multimodal.dHashImage(brighter) == h0, "brightness shift changed the hash")
    // contrast: strictly monotone stretch 2p-60 → 20..218, no clamping
    val stretched = Png.Gray(36, 28, base.pixels.map(p => 2 * p - 60))
    assert(Multimodal.dHashImage(stretched) == h0, "monotone contrast stretch changed the hash")
    // representation: gray vs RGB vs RGBA encodings of the same image, any
    // filter choice, decode to the same hash — a byte hash would differ
    val viaGray = Png.decode(Png.encodeGrayAs(base, 0, y => y % 5))
    val viaRgb = Png.decode(Png.encodeGrayAs(base, 2, y => (y + 3) % 5))
    val viaRgba = Png.decode(Png.encodeGrayAs(base, 6, _ => 4))
    assert(Multimodal.dHashImage(viaGray) == h0)
    assert(Multimodal.dHashImage(viaRgb) == h0)
    assert(Multimodal.dHashImage(viaRgba) == h0)
    // byte identity does NOT hold across representations (what dHash buys)
    assert(!java.util.Arrays.equals(Png.encodeGrayAs(base, 0), Png.encodeGrayAs(base, 2)))
  }

  test("dHash near-dup: a single-pixel edit moves hamming ≤ 1; unrelated images differ") {
    val base = mkGray(27, 21, (x, y) => (x * 13 + y * 29) % 251)
    val tweaked = Png.Gray(27, 21, base.pixels.clone)
    tweaked.pixels(0) = (tweaked.pixels(0) + 1) % 251
    val hb = Multimodal.dHashImage(base)
    val ht = Multimodal.dHashImage(tweaked)
    assert(java.lang.Long.bitCount(hb ^ ht) <= 1)
    val other = mkGray(27, 21, (x, y) => (x * 101 + y * 3 + 7) % 251)
    assert(java.lang.Long.bitCount(hb ^ Multimodal.dHashImage(other)) > 3,
      "structurally different images should not be near-dups")
  }

  test("non-dividing dimensions: cross-multiplied means, not truncated areas") {
    // 10x8 grid over 9x7 cells → unequal cell areas; a constant image must
    // hash to 0 (no gradient), which only holds if MEANS are compared
    val flat = mkGray(10, 8, (_, _) => 200)
    assert(Multimodal.dHashImage(flat) == 0L)
    // and a strict left-to-right ramp must set every bit (brighter → darker
    // comparisons all false… ramp up means right cell brighter) — direction check
    val ramp = mkGray(19, 9, (x, _) => x * 13)
    val h = Multimodal.dHashImage(ramp)
    assert(h == 0L, "increasing ramp: left cell never brighter than right")
    val rampDown = mkGray(19, 9, (x, _) => 250 - x * 13)
    assert(Multimodal.dHashImage(rampDown) == 0x00FFFFFFFFFFFFFFL,
      "decreasing ramp: every gradient bit set")
  }
}
