package graft.media

/** Pure-JVM GIF decoder (GIF87a/89a) — the third common web image format
  * behind the multimodal seam. Covers: global + local color tables, LZW
  * decompression (variable code width, 12-bit dictionary, clear/EOI),
  * 4-pass interlacing, extension-block skipping; decodes the FIRST frame
  * of animated files (the representative frame a near-dup pipeline hashes).
  * Output is the usual [[Png.Gray]] luma lattice.
  *
  * The fixture encoder writes valid LZW the simple published way: literal
  * codes with a CLEAR emitted before the dictionary would force a width
  * increase — bit-packed LSB-first like all GIF data.
  */
object Gif {

  def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  // ------------------------------------------------------------------ decode
  def decodeGray(bytes: Array[Byte]): Png.Gray = {
    if (!isGif(bytes)) throw new java.io.IOException("not a GIF signature")
    def b(p: Int): Int = {
      if (p < 0 || p >= bytes.length) throw new java.io.IOException("truncated GIF")
      bytes(p) & 0xff
    }
    def u16(p: Int): Int = b(p) | (b(p + 1) << 8) // little-endian

    var pos = 6
    val screenW = u16(pos); val screenH = u16(pos + 2)
    val flags = b(pos + 4)
    pos += 7
    var gct: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      gct = Array.tabulate(n)(i => (b(pos + 3 * i) << 16) | (b(pos + 3 * i + 1) << 8) | b(pos + 3 * i + 2))
      pos += 3 * n
    }
    if (screenW <= 0 || screenH <= 0 || screenW.toLong * screenH > (1L << 26))
      throw new java.io.IOException(s"bad GIF dimensions $screenW x $screenH")

    var frame: Png.Gray = null
    var done = false
    while (!done && frame == null) {
      b(pos) match {
        case 0x3B => done = true // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (b(pos) != 0) pos += 1 + b(pos)
          pos += 1
        case 0x2C => // image descriptor
          val w = u16(pos + 5); val h = u16(pos + 7)
          val iflags = b(pos + 9)
          pos += 10
          var table = gct
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            table = Array.tabulate(n)(i =>
              (b(pos + 3 * i) << 16) | (b(pos + 3 * i + 1) << 8) | b(pos + 3 * i + 2))
            pos += 3 * n
          }
          if (table == null) throw new java.io.IOException("GIF image without color table")
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26))
            throw new java.io.IOException(s"bad frame dimensions $w x $h")
          val minCode = b(pos); pos += 1
          if (minCode < 2 || minCode > 11) throw new java.io.IOException(s"bad LZW min code $minCode")
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (b(pos) != 0) {
            val n = b(pos)
            if (pos + 1 + n > bytes.length) throw new java.io.IOException("truncated sub-block")
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val indices = lzwDecode(data.toByteArray, minCode, w * h)
          // luma through the palette; de-interlace if flagged
          val gray = new Array[Int](w * h)
          val rowOrder: Array[Int] =
            if ((iflags & 0x40) != 0) {
              val order = new Array[Int](h)
              var r = 0
              Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
                var y = start
                while (y < h) { order(r) = y; r += 1; y += step }
              }
              order
            } else Array.tabulate(h)(identity)
          (0 until h).foreach { r =>
            val y = rowOrder(r)
            (0 until w).foreach { x =>
              val idx = indices(r * w + x)
              if (idx >= table.length) throw new java.io.IOException("palette index out of range")
              val rgb = table(idx)
              gray(y * w + x) =
                (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
            }
          }
          frame = Png.Gray(w, h, gray)
        case other => throw new java.io.IOException(f"unknown GIF block 0x$other%02X")
      }
    }
    if (frame == null) throw new java.io.IOException("GIF contains no image")
    frame
  }

  /** LZW decode (GIF variant): LSB-first bit packing, variable width from
    * minCode+1 up to 12, clear resets the dictionary, stops at EOI or when
    * `expected` pixels are produced.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int, expected: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = eoi + 1
    var width = minCode + 1
    val out = new Array[Int](expected)
    var outN = 0
    var bitPos = 0
    def read(): Int = {
      if ((bitPos + width - 1) / 8 >= data.length) -1
      else {
        var v = 0
        (0 until width).foreach { i =>
          val p = bitPos + i
          v |= (((data(p >> 3) >> (p & 7)) & 1) << i)
        }
        bitPos += width
        v
      }
    }
    def emit(code: Int): Unit = { // expand a code to out via the chain
      val stack = new Array[Int](4096)
      var sp = 0
      var c = code
      while (c >= clear + 2) {
        if (sp >= 4096) throw new java.io.IOException("LZW chain loop")
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      if (c >= clear) throw new java.io.IOException("corrupt LZW code chain")
      stack(sp) = c; sp += 1
      while (sp > 0 && outN < expected) { sp -= 1; out(outN) = stack(sp); outN += 1 }
    }
    def firstOf(code: Int): Int = {
      var c = code
      var guard = 0
      while (c >= clear + 2) {
        c = prefix(c)
        guard += 1
        if (guard > 4096) throw new java.io.IOException("LZW chain loop")
      }
      c
    }

    var prev = -1
    var stop = false
    while (!stop && outN < expected) {
      val code = read()
      if (code < 0 || code == eoi) stop = true
      else if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else {
        if (code > next || (code == next && prev < 0))
          throw new java.io.IOException("LZW code out of range")
        if (prev < 0) {
          if (code >= clear) throw new java.io.IOException("first code must be literal")
          out(outN) = code; outN += 1
          prev = code
        } else {
          if (code == next) { // KwKwK case
            if (next < 4096) {
              prefix(next) = prev; suffix(next) = firstOf(prev); next += 1
            }
            emit(next - 1)
          } else {
            if (next < 4096) {
              prefix(next) = prev; suffix(next) = firstOf(code); next += 1
            }
            emit(code)
          }
          prev = code
          if (next == (1 << width) && width < 12) width += 1
        }
      }
    }
    if (outN < expected)
      throw new java.io.IOException(s"LZW ended at $outN of $expected pixels")
    out
  }

  // ------------------------------------------------------------------ encode
  /** Fixture encoder: 8-bit grayscale palette (256 entries, v→(v,v,v)),
    * literal-code LZW with periodic CLEARs, optional interlacing.
    */
  def encodeGray(img: Png.Gray, interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(img.width); u16(img.height)
    out.write(0xF7) // GCT present, 256 entries, 8-bit color resolution
    out.write(0); out.write(0) // background, aspect
    (0 until 256).foreach { v => out.write(v); out.write(v); out.write(v) }
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(img.width); u16(img.height)
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(8) // LZW min code size

    // literal-only LZW, LSB-first, CLEAR before any width increase
    val body = new java.io.ByteArrayOutputStream()
    var cur = 0; var bits = 0
    def put(code: Int): Unit = { // width is fixed at 9 (256 literals + clear/eoi)
      cur |= code << bits
      bits += 9
      while (bits >= 8) { body.write(cur & 0xff); cur >>= 8; bits -= 8 }
    }
    val rows: Seq[Int] =
      if (interlaced) {
        val order = scala.collection.mutable.ArrayBuffer.empty[Int]
        Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (s0, st) =>
          var y = s0
          while (y < img.height) { order += y; y += st }
        }
        order.toSeq
      } else 0 until img.height
    put(256) // initial CLEAR
    var sinceClear = 0
    rows.foreach { y =>
      (0 until img.width).foreach { x =>
        // decoder's dict grows once per literal after the first; clear
        // before `next` would reach 512 and widen the code
        if (sinceClear == 254) { put(256); sinceClear = 0 }
        put(img(x, y) & 0xff)
        sinceClear += 1
      }
    }
    put(257) // EOI
    if (bits > 0) body.write(cur & 0xff)
    val payload = body.toByteArray
    var off = 0
    while (off < payload.length) {
      val n = math.min(255, payload.length - off)
      out.write(n)
      out.write(payload, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }
}
