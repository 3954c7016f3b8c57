package graft.html

import graft.core.PyStr
import scala.collection.mutable.ArrayBuffer

/** One emitted content block with char-span offsets into the final text
  * (≙ the reference's per-item lineage raw_text/line_number,
  * /root/reference/extractor/parsers/construction.py:191-193).
  */
final case class Span(start: Long, end: Long, kind: String)

final case class HtmlExtract(
    text: String,
    spans: Vector[Span],
    tables: Vector[Vector[Vector[Option[String]]]],
    /** bytes of input / blocks dropped — feed the strip-ratio metric */
    blocksKept: Int,
    blocksDropped: Int
)

/** Main-content extraction: lightweight DOM walk over the token stream +
  * boilerplate heuristics from the published literature (Boilerpipe
  * text/link-density — Kohlschütter et al., WSDM 2011; Readability/Arc90
  * tag- and class-blocklists). Deterministic; thresholds are constants
  * frozen by golden tests.
  */
object Boilerplate {

  /** Subtrees dropped wholesale by tag (Arc90-style). */
  private val dropTags = Set("nav", "header", "footer", "aside", "script",
    "style", "noscript", "form", "head", "title", "button", "iframe", "svg")

  /** Subtrees dropped by class/id (Readability negative-signal regex). */
  private val dropClassRx = java.util.regex.Pattern.compile(
    "(?i)(sidebar|comment|footer|foot\\b|nav\\b|menu|share|social|advert|\\bads?\\b|banner|related|widget|promo|breadcrumb)")

  /** Leaf block tags: their text becomes one emitted block each. */
  private val leafTags = Set("p", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "pre", "blockquote", "dt", "dd")

  /** Container block tags: structure only; direct inline content forms an
    * anonymous block (kept only if non-blank after strip).
    */
  private val containerTags = Set("html", "body", "article", "section", "main",
    "div", "ul", "ol", "dl", "figure", "figcaption")

  private val maxLinkDensity = 0.33

  private final class Block(val leaf: Boolean) {
    val text = new java.lang.StringBuilder
    var linkChars = 0
    def linkDensity: Double =
      if (text.length == 0) 0.0 else linkChars.toDouble / text.length
  }

  def extract(html: String): HtmlExtract = {
    val toks = Tokenizer.tokenize(html)
    val out = new java.lang.StringBuilder
    val spans = ArrayBuffer.empty[Span]
    val tables = ArrayBuffer.empty[Vector[Vector[Option[String]]]]
    var kept = 0
    var dropped = 0

    var dropDepth = 0 // >0 → inside a dropped subtree
    var linkDepth = 0
    val openDropTags = ArrayBuffer.empty[String]

    // table state
    var tableDepth = 0
    val curTable = ArrayBuffer.empty[Vector[Option[String]]]
    val curRow = ArrayBuffer.empty[Option[String]]
    var cellBuf: java.lang.StringBuilder = null

    val blockStack = ArrayBuffer.empty[(String, Block)] // open leaf/anon blocks

    def emit(b: Block): Unit = {
      val body = b.text.toString
      val keep =
        if (b.leaf) b.linkDensity <= maxLinkDensity
        else PyStr.strip(body).nonEmpty && b.linkDensity <= maxLinkDensity
      if (keep && (b.leaf || PyStr.strip(body).nonEmpty)) {
        val start = out.length.toLong
        if (out.length > 0) out.append('\n')
        val s = out.length.toLong
        out.append(body)
        val _ = start
        spans += Span(s, out.length.toLong, "block")
        kept += 1
      } else dropped += 1
    }

    def closeBlocksFor(tag: String): Unit = {
      // close innermost block(s) up to and including `tag` (or anon)
      var i = blockStack.length - 1
      var found = -1
      while (i >= 0 && found < 0) { if (blockStack(i)._1 == tag) found = i; i -= 1 }
      if (found >= 0) {
        while (blockStack.length > found) {
          val (_, b) = blockStack.remove(blockStack.length - 1)
          emit(b)
        }
      }
    }

    def flushAnon(): Unit =
      if (blockStack.nonEmpty && blockStack.last._1 == "#anon") {
        val (_, b) = blockStack.remove(blockStack.length - 1)
        emit(b)
      }

    toks.foreach {
      case TStart(name, attrs, selfClosing) =>
        val classId = attrs.getOrElse("class", "") + " " + attrs.getOrElse("id", "")
        val isDropped = dropTags(name) || dropClassRx.matcher(classId).find()
        if (dropDepth > 0) {
          if (!selfClosing && (dropTags(name) || !isVoid(name))) {
            // nested tag inside dropped subtree — track depth by tag name
            if (openDropTags.nonEmpty) openDropTags += name
          }
        } else if (isDropped && !selfClosing) {
          flushAnon()
          dropDepth = 1
          openDropTags.clear()
          openDropTags += name
        } else if (!isDropped) {
          name match {
            case "table" if tableDepth == 0 =>
              flushAnon(); tableDepth = 1; curTable.clear()
            case "tr" if tableDepth > 0 => curRow.clear()
            case "td" | "th" if tableDepth > 0 => cellBuf = new java.lang.StringBuilder
            case "a" => linkDepth += 1
            case "br" =>
              if (blockStack.nonEmpty) blockStack.last._2.text.append('\n')
            case t if leafTags(t) =>
              flushAnon()
              // implicit close of an already-open identical leaf (HTML5 <p> rule)
              if (blockStack.nonEmpty && blockStack.last._1 == t) closeBlocksFor(t)
              blockStack += ((t, new Block(leaf = true)))
            case t if containerTags(t) =>
              flushAnon()
            case _ => ()
          }
        }

      case TEnd(name) =>
        if (dropDepth > 0) {
          // pop tracked open tags in the dropped subtree
          val idx = openDropTags.lastIndexOf(name)
          if (idx == 0) { dropDepth = 0; openDropTags.clear() }
          else if (idx > 0) openDropTags.remove(idx)
        } else {
          name match {
            case "table" if tableDepth > 0 =>
              tableDepth = 0
              if (curTable.nonEmpty) tables += curTable.toVector
            case "tr" if tableDepth > 0 =>
              if (curRow.nonEmpty) { curTable += curRow.toVector; curRow.clear() }
            case "td" | "th" if tableDepth > 0 =>
              if (cellBuf != null) {
                val t = cellBuf.toString
                curRow += (if (t.isEmpty) None else Some(t))
                cellBuf = null
              }
            case "a" => if (linkDepth > 0) linkDepth -= 1
            case t if leafTags(t) => closeBlocksFor(t)
            case t if containerTags(t) => flushAnon()
            case _ => ()
          }
        }

      case TText(t) if t.nonEmpty =>
        if (dropDepth == 0) {
          if (cellBuf != null) cellBuf.append(t)
          else if (tableDepth > 0) () // inter-cell whitespace inside table
          else {
            if (blockStack.isEmpty || !blockStack.last._2.leaf) {
              if (blockStack.isEmpty || blockStack.last._1 != "#anon") {
                if (PyStr.strip(t).isEmpty) {
                  // stray inter-tag whitespace — ignore
                } else blockStack += (("#anon", new Block(leaf = false)))
              }
            }
            if (blockStack.nonEmpty && (blockStack.last._2.leaf || blockStack.last._1 == "#anon")) {
              val b = blockStack.last._2
              b.text.append(t)
              if (linkDepth > 0) b.linkChars += t.length
            }
          }
        }

      case _ => ()
    }
    // close any leftovers (malformed HTML)
    while (blockStack.nonEmpty) {
      val (_, b) = blockStack.remove(blockStack.length - 1)
      emit(b)
    }

    HtmlExtract(out.toString, spans.toVector, tables.toVector, kept, dropped)
  }

  private val voidTags = Set("br", "hr", "img", "input", "meta", "link", "area",
    "base", "col", "embed", "source", "track", "wbr")
  private def isVoid(name: String) = voidTags(name)
}
