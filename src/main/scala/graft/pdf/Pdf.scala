package graft.pdf

import scala.collection.mutable.ArrayBuffer

/** Minimal deterministic PDF subset: writer (fixture generation) + parser
  * (the engine's PDF path). Covers what the north rule names — content-
  * stream tokenize, text-run ordering, column/paragraph reconstruction —
  * for the subset the fixture generator emits: xref, Flate or plain
  * content streams, BT/ET, Tf, Td/TD/Tm, Tj/TJ/'. Replaces the reference's
  * pdfplumber `page.extract_text()` role
  * (/root/reference/extractor/extractors/pdf_text_extractor.py:146).
  *
  * Anything outside the subset passes through as an empty page + a metric,
  * mirroring the reference's fallback-not-fail philosophy
  * (pdf_text_extractor.py:75-98,195-198).
  */
object Pdf {

  final case class TextRun(x: Double, y: Double, text: String)
  /** A straight ruling-line segment from the page's path operators. */
  final case class Seg(x1: Double, y1: Double, x2: Double, y2: Double)
  final case class PdfPage(width: Double, height: Double, runs: Vector[TextRun],
                           segs: Vector[Seg] = Vector.empty)

  /** One page of writer input: text-line placements plus zero or more
    * tables (rows of Optional cells, the reference's table shape —
    * pdf_text_extractor.py:184-192). Tables are rendered as a ruled grid
    * (m/l/S path segments) with one text run per non-empty cell, placed
    * below the lowest text line — the structure `extract_tables`-style
    * reconstruction needs ("lines_strict": only existing lines).
    */
  final case class PageSpec(placements: Seq[(Double, Double, String)],
                            tables: Seq[Seq[Seq[Option[String]]]] = Nil)

  private val CellW = 90.0
  private val RowH = 14.0

  // ------------------------------------------------------------------ write
  /** Write a PDF whose page texts round-trip through `parse` + `Layout`.
    * Each input page is a list of (x, y, line) placements.
    */
  def write(pages: Seq[Seq[(Double, Double, String)]], flate: Boolean,
            width: Double = 612.0, height: Double = 792.0): Array[Byte] =
    writePages(pages.map(p => PageSpec(p)), flate, width, height)

  def writePages(pages: Seq[PageSpec], flate: Boolean,
                 width: Double = 612.0, height: Double = 792.0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val offsets = ArrayBuffer.empty[Int]
    def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def obj(body: Array[Byte]): Unit = { offsets += out.size(); out.write(body) }

    out.write(bytes("%PDF-1.4\n"))
    val nPages = pages.length
    // object numbering: 1 catalog, 2 pages, 3 font, 4..3+n page objs, 4+n..3+2n contents
    val pageObjNums = (0 until nPages).map(4 + _)
    val contObjNums = (0 until nPages).map(4 + nPages + _)

    obj(bytes("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
    obj(bytes(s"2 0 obj\n<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>\nendobj\n"))
    obj(bytes("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"))
    pages.indices.foreach { i =>
      obj(bytes(s"${pageObjNums(i)} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $width $height] /Contents ${contObjNums(i)} 0 R " +
        "/Resources << /Font << /F1 3 0 R >> >> >>\nendobj\n"))
    }
    pages.zipWithIndex.foreach { case (spec, i) =>
      val content = new java.lang.StringBuilder
      spec.placements.foreach { case (x, y, line) =>
        content.append("BT /F1 10 Tf 1 0 0 1 ").append(fmtNum(x)).append(' ')
          .append(fmtNum(y)).append(" Tm (").append(escapeString(line)).append(") Tj ET\n")
      }
      if (spec.tables.nonEmpty) {
        def seg(x1: Double, y1: Double, x2: Double, y2: Double): Unit =
          content.append(fmtNum(x1)).append(' ').append(fmtNum(y1)).append(" m ")
            .append(fmtNum(x2)).append(' ').append(fmtNum(y2)).append(" l S\n")
        // tables stack below the lowest text line so long (fat) pages can
        // never push text runs into a grid bbox
        val minY = if (spec.placements.isEmpty) 760.0 else spec.placements.map(_._2).min
        var yTop = minY - 30.0
        spec.tables.foreach { table =>
          val rows = table.length
          val cols = table.map(_.length).max
          val x0 = 50.0
          (0 to cols).foreach(j => seg(x0 + j * CellW, yTop, x0 + j * CellW, yTop - rows * RowH))
          (0 to rows).foreach(r => seg(x0, yTop - r * RowH, x0 + cols * CellW, yTop - r * RowH))
          table.zipWithIndex.foreach { case (row, r) =>
            row.zipWithIndex.foreach {
              case (Some(cell), j) if cell.nonEmpty =>
                content.append("BT /F1 10 Tf 1 0 0 1 ").append(fmtNum(x0 + j * CellW + 3))
                  .append(' ').append(fmtNum(yTop - (r + 1) * RowH + 4))
                  .append(" Tm (").append(escapeString(cell)).append(") Tj ET\n")
              case _ => ()
            }
          }
          yTop -= rows * RowH + 24.0 // gap keeps grid clusters disjoint
        }
      }
      val raw = bytes(content.toString)
      val data = if (flate) deflate(raw) else raw
      val filter = if (flate) " /Filter /FlateDecode" else ""
      obj(bytes(s"${contObjNums(i)} 0 obj\n<< /Length ${data.length}$filter >>\nstream\n"))
      out.write(data)
      out.write(bytes("\nendstream\nendobj\n"))
    }
    val xrefPos = out.size()
    val total = offsets.length + 1
    out.write(bytes(s"xref\n0 $total\n0000000000 65535 f \n"))
    offsets.foreach(o => out.write(bytes(f"$o%010d 00000 n \n")))
    out.write(bytes(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n"))
    out.toByteArray
  }

  private def fmtNum(d: Double): String =
    if (d == d.toLong) d.toLong.toString else d.toString

  /** PDF string escaping: backslash, parens, and the control chars we emit. */
  def escapeString(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](math.max(64, data.length * 2 + 64))
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new java.io.IOException("truncated flate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // ------------------------------------------------------------------ parse
  def isPdf(payload: Array[Byte]): Boolean =
    payload.length >= 5 && payload(0) == '%' && payload(1) == 'P' &&
      payload(2) == 'D' && payload(3) == 'F' && payload(4) == '-'

  /** Parse the subset: object scan → /Kids page order → per-page content
    * stream → text runs. Throws on anything outside the subset (callers
    * convert to a pass-through + metric).
    */
  def parse(payload: Array[Byte]): Vector[PdfPage] = {
    // Objects are latin-1-decodable byte-wise; strings we re-decode as UTF-8.
    val latin = new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1)

    // collect "N 0 obj ... endobj" with optional stream payload
    val objRx = java.util.regex.Pattern.compile("""(\d+)\s+0\s+obj""")
    val m = objRx.matcher(latin)
    val dicts = scala.collection.mutable.Map.empty[Int, String]
    val streams = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    while (m.find()) {
      val num = m.group(1).toInt
      val bodyStart = m.end()
      val endObj = latin.indexOf("endobj", bodyStart)
      if (endObj < 0) throw new java.io.IOException("unterminated object")
      val body = latin.substring(bodyStart, endObj)
      val streamIdx = body.indexOf("stream")
      if (streamIdx >= 0 && body.contains("endstream")) {
        val dict = body.substring(0, streamIdx)
        dicts(num) = dict
        // stream data starts after "stream\n" (or \r\n)
        var ds = bodyStart + streamIdx + "stream".length
        if (latin.charAt(ds) == '\r') ds += 1
        if (latin.charAt(ds) == '\n') ds += 1
        val len = extractInt(dict, "/Length").getOrElse(
          throw new java.io.IOException("stream without /Length"))
        streams(num) = java.util.Arrays.copyOfRange(payload, ds, ds + len)
      } else dicts(num) = body
    }

    // find the Pages node and Kids order
    val pagesObj = dicts.collectFirst {
      case (_, d) if d.contains("/Type /Pages") => d
    }.getOrElse(throw new java.io.IOException("no /Pages"))
    val kidRx = java.util.regex.Pattern.compile("""(\d+)\s+0\s+R""")
    val kidsSection = pagesObj.substring(pagesObj.indexOf("/Kids"))
    val km = kidRx.matcher(kidsSection.substring(0, kidsSection.indexOf(']') + 1))
    val kids = ArrayBuffer.empty[Int]
    while (km.find()) kids += km.group(1).toInt

    kids.toVector.map { pn =>
      val pd = dicts.getOrElse(pn, throw new java.io.IOException(s"missing page obj $pn"))
      val mb = extractNums(pd, "/MediaBox", 4)
      val contents = extractInt(pd, "/Contents").getOrElse(
        throw new java.io.IOException("page without /Contents"))
      val contentDict = dicts.getOrElse(contents, "")
      val rawStream = streams.getOrElse(contents,
        throw new java.io.IOException(s"missing content stream $contents"))
      val data =
        if (contentDict.contains("/FlateDecode")) inflate(rawStream) else rawStream
      val (runs, segs) = tokenizeContent(new String(data, java.nio.charset.StandardCharsets.UTF_8))
      PdfPage(mb(2) - mb(0), mb(3) - mb(1), runs, segs)
    }
  }

  private def extractInt(dict: String, key: String): Option[Int] = {
    val p = java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(key) + """\s+(\d+)""")
    val m = p.matcher(dict)
    if (m.find()) Some(m.group(1).toInt) else None
  }

  private def extractNums(dict: String, key: String, n: Int): Vector[Double] = {
    val idx = dict.indexOf(key)
    if (idx < 0) return Vector.fill(n)(0.0)
    val close = dict.indexOf(']', idx)
    val section = dict.substring(dict.indexOf('[', idx) + 1, close)
    section.trim.split("\\s+").take(n).map(_.toDouble).toVector
  }

  /** Content-stream tokenizer: operand stack + the text operators of the
    * subset (Tf Td TD Tm T* Tj ' TJ BT ET) plus the path operators that
    * carry table ruling lines (m l S).
    */
  def tokenizeContent(content: String): (Vector[TextRun], Vector[Seg]) = {
    val runs = ArrayBuffer.empty[TextRun]
    val segs = ArrayBuffer.empty[Seg]
    var i = 0
    val n = content.length
    val operands = ArrayBuffer.empty[Any] // Double | String | Vector[Any]

    var curX = 0.0; var curY = 0.0         // text-line origin
    var leading = 0.0
    var pathX = 0.0; var pathY = 0.0       // current path point (m/l)
    var hasPoint = false

    def popNums(k: Int): Vector[Double] = {
      val vs = operands.takeRight(k).map {
        case d: Double => d
        case s: String => s.toDouble
        case _         => 0.0
      }.toVector
      operands.remove(operands.length - k, k)
      vs
    }

    def emit(s: String): Unit = runs += TextRun(curX, curY, s)

    while (i < n) {
      val c = content.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') {
        val (s, next) = readString(content, i)
        operands += s; i = next
      } else if (c == '[') {
        // TJ array: strings + kerning numbers
        i += 1
        val sb = new java.lang.StringBuilder
        var done = false
        while (!done && i < n) {
          val cc = content.charAt(i)
          if (cc == ']') { done = true; i += 1 }
          else if (cc == '(') { val (s, next) = readString(content, i); sb.append(s); i = next }
          else i += 1 // kerning numbers don't affect ordering
        }
        operands += sb.toString
      } else if (c == '/') {
        val start = i; i += 1
        while (i < n && !content.charAt(i).isWhitespace && content.charAt(i) != '/' &&
               content.charAt(i) != '(' && content.charAt(i) != '[') i += 1
        operands += content.substring(start, i)
      } else if (c == '-' || c == '.' || c.isDigit) {
        val start = i; i += 1
        while (i < n && (content.charAt(i).isDigit || content.charAt(i) == '.')) i += 1
        operands += content.substring(start, i).toDouble
      } else {
        val start = i
        while (i < n && !content.charAt(i).isWhitespace && content.charAt(i) != '(' &&
               content.charAt(i) != '[' && content.charAt(i) != '/') i += 1
        val op = content.substring(start, i)
        op match {
          case "BT" => curX = 0; curY = 0; leading = 0; operands.clear()
          case "ET" => operands.clear()
          case "Tf" => operands.clear()
          case "Tm" =>
            val v = popNums(6); curX = v(4); curY = v(5); operands.clear()
          case "Td" =>
            val v = popNums(2); curX += v(0); curY += v(1); operands.clear()
          case "TD" =>
            val v = popNums(2); leading = -v(1); curX += v(0); curY += v(1); operands.clear()
          case "T*" => curY -= leading; operands.clear()
          case "Tj" | "'" =>
            if (op == "'") curY -= leading
            operands.lastOption.foreach { case s: String => emit(s); case _ => () }
            operands.clear()
          case "TJ" =>
            operands.lastOption.foreach { case s: String => emit(s); case _ => () }
            operands.clear()
          case "m" =>
            val v = popNums(2); pathX = v(0); pathY = v(1); hasPoint = true
            operands.clear()
          case "l" =>
            val v = popNums(2)
            if (hasPoint) segs += Seg(pathX, pathY, v(0), v(1))
            pathX = v(0); pathY = v(1); hasPoint = true
            operands.clear()
          case "S" => hasPoint = false; operands.clear()
          case _ => operands.clear() // unknown operator: subset tolerates and drops
        }
      }
    }
    (runs.toVector, segs.toVector)
  }

  // ----------------------------------------------------------------- tables
  /** Reconstruct ruled-grid tables from a page's path segments and split
    * the text runs into (tables, non-table runs) — the engine-side analog
    * of pdfplumber's `extract_tables(vertical/horizontal_strategy =
    * "lines_strict")` (reference pdf_text_extractor.py:184-192): a table
    * exists only where actual ruling lines form a grid; cells are the
    * line-bounded rectangles; a run belongs to the cell containing its
    * origin. Tables are returned top-to-bottom, left-to-right; cells with
    * no run are None (the reference's Optional[str] cell shape).
    */
  def splitTables(page: PdfPage): (Vector[Seq[Seq[Option[String]]]], Vector[TextRun]) = {
    if (page.segs.isEmpty) return (Vector.empty, page.runs)
    val eps = 0.5
    val segs = page.segs
    // cluster segments into grids: union-find on (expanded) bbox overlap
    val n = segs.length
    val parent = Array.tabulate(n)(identity)
    def find(a: Int): Int = { var r = a; while (parent(r) != r) r = parent(r); parent(a) = r; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(ra) = rb }
    def bbox(s: Seg) = (math.min(s.x1, s.x2) - 3, math.min(s.y1, s.y2) - 3,
      math.max(s.x1, s.x2) + 3, math.max(s.y1, s.y2) + 3)
    for (a <- 0 until n; b <- a + 1 until n) {
      val (ax1, ay1, ax2, ay2) = bbox(segs(a)); val (bx1, by1, bx2, by2) = bbox(segs(b))
      if (ax1 <= bx2 && bx1 <= ax2 && ay1 <= by2 && by1 <= ay2) union(a, b)
    }
    val clusters = segs.indices.groupBy(find).values.toVector
    val grids = clusters.flatMap { idxs =>
      val cl = idxs.map(segs)
      val xs = cl.filter(s => math.abs(s.x1 - s.x2) < eps).map(_.x1)
        .sorted.foldLeft(Vector.empty[Double])((acc, x) =>
          if (acc.nonEmpty && x - acc.last < eps) acc else acc :+ x)
      val ys = cl.filter(s => math.abs(s.y1 - s.y2) < eps).map(_.y1)
        .sorted.foldLeft(Vector.empty[Double])((acc, y) =>
          if (acc.nonEmpty && y - acc.last < eps) acc else acc :+ y)
      if (xs.length >= 2 && ys.length >= 2) Some((xs, ys.reverse)) else None
    }.sortBy { case (xs, ysDesc) => (-ysDesc.head, xs.head) }
    if (grids.isEmpty) return (Vector.empty, page.runs)

    val used = scala.collection.mutable.BitSet.empty
    val tables = grids.map { case (xs, ysDesc) =>
      val cols = xs.length - 1
      val rows = ysDesc.length - 1
      val cells = Array.fill(rows, cols)(Vector.empty[TextRun])
      page.runs.zipWithIndex.foreach { case (r, ri) =>
        if (!used(ri) &&
            r.x >= xs.head && r.x < xs.last && r.y > ysDesc.last && r.y <= ysDesc.head) {
          val j = xs.lastIndexWhere(_ <= r.x) min (cols - 1)
          val i = ysDesc.indexWhere(_ < r.y) match {
            case -1 => rows - 1
            case k  => (k - 1) max 0
          }
          cells(i)(j) = cells(i)(j) :+ r
          used += ri
        }
      }
      (0 until rows).map { i =>
        (0 until cols).map { j =>
          val rs = cells(i)(j)
          if (rs.isEmpty) None
          else Some(rs.sortBy(r => (-r.y, r.x)).map(_.text).mkString("\n"))
        }: Seq[Option[String]]
      }: Seq[Seq[Option[String]]]
    }
    val rest = page.runs.zipWithIndex.collect { case (r, ri) if !used(ri) => r }
    (tables, rest)
  }

  private def readString(content: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = start + 1
    var depth = 1
    val n = content.length
    while (i < n && depth > 0) {
      val c = content.charAt(i)
      if (c == '\\' && i + 1 < n) {
        content.charAt(i + 1) match {
          case 'n'  => sb.append('\n')
          case 'r'  => sb.append('\r')
          case 't'  => sb.append('\t')
          case '\\' => sb.append('\\')
          case '('  => sb.append('(')
          case ')'  => sb.append(')')
          case other => sb.append(other)
        }
        i += 2
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }
}

/** Text-run ordering → page text: columns split by x-gap, runs ordered
  * (y desc, x asc) within a column, columns left→right, lines joined "\n".
  */
object Layout {
  import Pdf.TextRun

  private val columnGap = 150.0

  def pageText(runs: Vector[TextRun]): String = {
    if (runs.isEmpty) return ""
    // cluster x origins into columns
    val xs = runs.map(_.x).distinct.sorted
    val colStarts = ArrayBuffer(xs.head)
    xs.tail.foreach { x => if (x - colStarts.last > columnGap) colStarts += x }
    def colOf(x: Double): Int = {
      var ci = 0
      colStarts.zipWithIndex.foreach { case (cs, k) => if (x >= cs - 1e-9) ci = k }
      ci
    }
    val byCol = runs.groupBy(r => colOf(r.x)).toVector.sortBy(_._1)
    byCol.map { case (_, colRuns) =>
      colRuns.sortBy(r => (-r.y, r.x)).map(_.text).mkString("\n")
    }.mkString("\n")
  }
}
