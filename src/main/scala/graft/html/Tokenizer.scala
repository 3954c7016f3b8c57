package graft.html

import scala.collection.mutable.ArrayBuffer

/** Streaming HTML tokenizer — single pass, no DOM library, built from
  * scratch (north rule: "batched streaming HTML tokenizer"). Emits
  * start/end/text/comment tokens; raw-text elements (script/style) swallow
  * their content until the matching close tag. Entity decoding covers the
  * named entities our corpus emits plus numeric references.
  */
sealed trait Tok
final case class TStart(name: String, attrs: Map[String, String], selfClosing: Boolean) extends Tok
final case class TEnd(name: String) extends Tok
final case class TText(text: String) extends Tok
final case class TComment(text: String) extends Tok

object Tokenizer {

  private val rawTextTags = Set("script", "style")

  def tokenize(html: String): List[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    val n = html.length
    var i = 0
    val text = new java.lang.StringBuilder
    // lowercased once: searching the close tag of every script/style block
    // on a per-block html.toLowerCase was O(n^2) on script-heavy pages
    lazy val lower = html.toLowerCase

    def flushText(): Unit =
      if (text.length > 0) { out += TText(decodeEntities(text.toString)); text.setLength(0) }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            val stop = if (end < 0) n else end
            out += TComment(html.substring(i + 4, stop))
            i = if (end < 0) n else end + 3
          } else { // doctype or bogus declaration
            val end = html.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '/' || c1.isLetter) {
          flushText()
          val (tok, next) = readTag(html, i)
          i = next
          tok match {
            case Some(st @ TStart(name, _, false)) if rawTextTags(name) =>
              out += st
              val close = s"</$name"
              val idx = lower.indexOf(close, i)
              val stop = if (idx < 0) n else idx
              // raw text content is dropped from the text stream (script/style)
              out += TText("") // placeholder keeps token count stable; ignored downstream
              i = stop
              if (idx >= 0) {
                val gt = html.indexOf('>', idx)
                out += TEnd(name)
                i = if (gt < 0) n else gt + 1
              }
            case Some(t) => out += t
            case None    => ()
          }
        } else { text.append(c); i += 1 }
      } else { text.append(c); i += 1 }
    }
    flushText()
    out.toList
  }

  /** Parse one tag starting at `<`. Returns token + index after '>'. */
  private def readTag(html: String, start: Int): (Option[Tok], Int) = {
    val n = html.length
    var i = start + 1
    val isEnd = i < n && html.charAt(i) == '/'
    if (isEnd) i += 1
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val name = html.substring(nameStart, i).toLowerCase
    if (name.isEmpty) return (None, math.min(i + 1, n))

    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i < n && html.charAt(i) == '>') { i += 1; done = true }
      else if (i + 1 < n && html.charAt(i) == '/' && html.charAt(i + 1) == '>') {
        selfClosing = true; i += 2; done = true
      } else if (i < n) {
        val aStart = i
        while (i < n && html.charAt(i) != '=' && html.charAt(i) != '>' &&
               !html.charAt(i).isWhitespace && html.charAt(i) != '/') i += 1
        val aName = html.substring(aStart, i).toLowerCase
        var aVal = ""
        if (i < n && html.charAt(i) == '=') {
          i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i); i += 1
            val vStart = i
            while (i < n && html.charAt(i) != q) i += 1
            aVal = html.substring(vStart, i)
            if (i < n) i += 1
          } else {
            val vStart = i
            while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
            aVal = html.substring(vStart, i)
          }
        }
        if (aName.nonEmpty) attrs(aName) = decodeEntities(aVal)
        // progress guard: a bare '/' not followed by '>' (e.g. "<a /x>")
        // yields an empty attr name and would otherwise loop forever
        else if (aVal.isEmpty && i < n && html.charAt(i) == '/') i += 1
      } else done = true
    }
    val tok = if (isEnd) TEnd(name) else TStart(name, attrs.toMap, selfClosing)
    (Some(tok), i)
  }

  /** Minimal entity decode: the named set the corpus encoder emits plus
    * numeric char refs.
    */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: String = ent match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ =>
              if (ent.startsWith("#x") || ent.startsWith("#X"))
                try new String(Character.toChars(Integer.parseInt(ent.substring(2), 16)))
                catch { case _: Exception => null }
              else if (ent.startsWith("#"))
                try new String(Character.toChars(Integer.parseInt(ent.substring(1))))
                catch { case _: Exception => null }
              else null
          }
          if (decoded != null) { sb.append(decoded); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Encode text for embedding in HTML (corpus generator side). */
  def encode(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
