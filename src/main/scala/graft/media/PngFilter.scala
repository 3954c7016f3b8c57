package graft.media

/** PNG scanline prediction (RFC 2083 §6) — the per-row filter algebra shared
  * by two consumers:
  *
  *   - PDF cross-reference / content streams declaring
  *     `/DecodeParms << /Predictor 12 /Columns n >>` (ISO 32000-1 §7.4.4.4:
  *     PDF predictors 10-15 ARE the PNG filters, one filter-type byte per
  *     row) — decoded by [[graft.pdf.Pdf]];
  *   - baseline PNG image payloads (IDAT scanlines) — decoded by
  *     [[graft.media.Png]].
  *
  * All five filter types (None/Sub/Up/Average/Paeth). `bpp` is the
  * byte-distance to the left-reference sample (max(1, bitsPerPixel/8)).
  */
object PngFilter {

  /** Paeth predictor (RFC 2083 §6.6): nearest of left/above/upper-left. */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode `height` filtered rows: input is the concatenation of
    * (filter-type byte ++ rowBytes data) per row; output is the
    * concatenated raw rows. Throws on truncated input or an unknown
    * filter type.
    */
  def unfilter(data: Array[Byte], rowBytes: Int, bpp: Int): Array[Byte] = {
    require(rowBytes > 0 && bpp > 0, s"rowBytes=$rowBytes bpp=$bpp")
    val stride = rowBytes + 1
    if (data.length % stride != 0)
      throw new java.io.IOException(
        s"predicted data length ${data.length} not a multiple of row stride $stride")
    val rows = data.length / stride
    val out = new Array[Byte](rows * rowBytes)
    var r = 0
    while (r < rows) {
      val ft = data(r * stride) & 0xff
      val in = r * stride + 1
      val o = r * rowBytes
      val prev = o - rowBytes // valid iff r > 0
      var i = 0
      ft match {
        case 0 => // None
          System.arraycopy(data, in, out, o, rowBytes)
        case 1 => // Sub
          while (i < rowBytes) {
            val left = if (i >= bpp) out(o + i - bpp) & 0xff else 0
            out(o + i) = ((data(in + i) & 0xff) + left).toByte; i += 1
          }
        case 2 => // Up
          while (i < rowBytes) {
            val up = if (r > 0) out(prev + i) & 0xff else 0
            out(o + i) = ((data(in + i) & 0xff) + up).toByte; i += 1
          }
        case 3 => // Average
          while (i < rowBytes) {
            val left = if (i >= bpp) out(o + i - bpp) & 0xff else 0
            val up = if (r > 0) out(prev + i) & 0xff else 0
            out(o + i) = ((data(in + i) & 0xff) + ((left + up) >> 1)).toByte; i += 1
          }
        case 4 => // Paeth
          while (i < rowBytes) {
            val left = if (i >= bpp) out(o + i - bpp) & 0xff else 0
            val up = if (r > 0) out(prev + i) & 0xff else 0
            val ul = if (r > 0 && i >= bpp) out(prev + i - bpp) & 0xff else 0
            out(o + i) = ((data(in + i) & 0xff) + paeth(left, up, ul)).toByte; i += 1
          }
        case other =>
          throw new java.io.IOException(s"unknown PNG filter type $other at row $r")
      }
      r += 1
    }
    out
  }

  /** Encode raw rows with a per-row filter choice (`ftForRow(r)` ∈ 0..4):
    * the exact inverse of [[unfilter]]. Used by the fixture writers (PDF
    * predicted xref streams, PNG encoder) so decode is exercised against
    * every filter type, not just None.
    */
  def filter(raw: Array[Byte], rowBytes: Int, bpp: Int, ftForRow: Int => Int): Array[Byte] = {
    require(rowBytes > 0 && bpp > 0 && raw.length % rowBytes == 0)
    val rows = raw.length / rowBytes
    val out = new Array[Byte](rows * (rowBytes + 1))
    var r = 0
    while (r < rows) {
      val ft = ftForRow(r)
      require(ft >= 0 && ft <= 4, s"filter type $ft")
      val o = r * (rowBytes + 1)
      val in = r * rowBytes
      val prev = in - rowBytes
      out(o) = ft.toByte
      var i = 0
      while (i < rowBytes) {
        val cur = raw(in + i) & 0xff
        val left = if (i >= bpp) raw(in + i - bpp) & 0xff else 0
        val up = if (r > 0) raw(prev + i) & 0xff else 0
        val ul = if (r > 0 && i >= bpp) raw(prev + i - bpp) & 0xff else 0
        val predicted = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 => paeth(left, up, ul)
        }
        out(o + 1 + i) = (cur - predicted).toByte
        i += 1
      }
      r += 1
    }
    out
  }
}
