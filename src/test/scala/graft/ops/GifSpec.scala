package graft.ops

import graft.media.{Gif, Png}
import org.scalatest.funsuite.AnyFunSuite

/** GIF decoder (round 5): LZW round-trips losslessly through the grayscale
  * palette, interlaced frames deinterlace, extensions skip, and the decoder
  * survives corruption with IOException only.
  */
class GifSpec extends AnyFunSuite {

  private def mkGray(w: Int, h: Int, f: (Int, Int) => Int): Png.Gray =
    Png.Gray(w, h, Array.tabulate(w * h)(i => f(i % w, i / w) & 0xff))

  test("grayscale round-trip is lossless, plain and interlaced") {
    for ((w, h) <- Seq((23, 17), (8, 8), (72, 56), (300, 3), (1, 1), (5, 37))) {
      val img = mkGray(w, h, (x, y) => (x * 31 + y * 57 + 11) % 256)
      for (il <- Seq(false, true)) {
        val back = Gif.decodeGray(Gif.encodeGray(img, interlaced = il))
        assert(back.width == w && back.height == h)
        assert(back.pixels.toSeq == img.pixels.toSeq, s"$w x $h interlaced=$il")
      }
    }
  }

  test("extension blocks are skipped; 87a accepted") {
    val img = mkGray(10, 7, (x, y) => x * 20 + y)
    val base = Gif.encodeGray(img)
    // splice a graphic-control extension after the color table
    val gctEnd = 6 + 7 + 256 * 3
    val ext = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = base.take(gctEnd) ++ ext ++ base.drop(gctEnd)
    assert(Gif.decodeGray(spliced).pixels.toSeq == img.pixels.toSeq)
    val v87 = base.clone; v87(4) = '7'
    assert(Gif.decodeGray(v87).pixels.toSeq == img.pixels.toSeq)
  }

  test("dHash over GIF equals dHash over PNG of the same image") {
    val img = mkGray(36, 28, (x, y) => 40 + (x * 5 + y * 7) % 100)
    assert(Multimodal.dHashImage(Gif.decodeGray(Gif.encodeGray(img))) ==
      Multimodal.dHashImage(Png.decode(Png.encodeGrayAs(img, 2))))
  }

  test("corrupt GIFs: IOException only, no hangs or leaks") {
    val good = Gif.encodeGray(mkGray(19, 13, (x, y) => x * y % 256))
    assert(!Gif.isGif("GIF66a".getBytes))
    val rnd = new scala.util.Random(31)
    (0 until 300).foreach { k =>
      val bad = good.clone
      (0 to rnd.nextInt(5)).foreach(_ => bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte)
      try { Gif.decodeGray(bad); () }
      catch {
        case _: java.io.IOException => ()
        case e: Throwable => fail(s"iteration $k leaked ${e.getClass.getName}: ${e.getMessage}")
      }
      val cut = java.util.Arrays.copyOfRange(good, 0, 1 + rnd.nextInt(good.length))
      try { Gif.decodeGray(cut); () } catch { case _: java.io.IOException => () }
    }
  }
}
