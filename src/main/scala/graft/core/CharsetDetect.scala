package graft.core

import java.nio.charset.{CodingErrorAction, StandardCharsets}

/** Charset detection + decoding for raw crawl bytes — the step every
  * webtext pipeline needs before tokenization and the one this engine's
  * UTF-8-everywhere paths previously assumed away. The policy is the
  * pragmatic subset of the WHATWG Encoding Standard that CCNet-class
  * pipelines apply (detect → decode → NFC later in the chain), fully
  * deterministic and allocation-light:
  *
  *  1. BOM (UTF-8 / UTF-16LE / UTF-16BE) is decisive.
  *  2. A strict UTF-8 validation pass over the whole payload: zero
  *     malformed sequences with at least one multi-byte sequence →
  *     UTF-8 (the web's biggest practical fix: valid UTF-8 bodies
  *     mislabeled by their meta tag decode as mojibake if the label is
  *     honored — validity outranks declaration).
  *  3. Zero malformed and pure ASCII → UTF-8 (every candidate charset
  *     agrees on these bytes).
  *  4. Malformed UTF-8 with a `<meta charset=…>` /
  *     `http-equiv Content-Type` declaration in the first 1024 bytes →
  *     the declared charset, with labels normalized per WHATWG
  *     (`iso-8859-1`, `latin1`, `ascii` and friends all mean
  *     windows-1252 on the real web).
  *  5. Otherwise → windows-1252, the WHATWG fallback.
  *
  * windows-1252 decoding is hand-rolled from the fixed WHATWG index
  * table (0x80–0x9F; every other byte maps to its own code point), so
  * results cannot vary with JVM charset providers.
  */
object CharsetDetect {

  final case class Detection(charset: String, reason: String)

  /** WHATWG windows-1252 index: code points for bytes 0x80–0x9F, as
    * \\u escapes (raw literals would be invisible control chars for 81,
    * 8D, 8F, 90, 9D). Bytes 0x00–0x7F and 0xA0–0xFF map to themselves.
    */
  private val Cp1252High: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026', '\u2020', '\u2021',
    '\u02C6', '\u2030', '\u0160', '\u2039', '\u0152', '\u008D', '\u017D', '\u008F',
    '\u0090', '\u2018', '\u2019', '\u201C', '\u201D', '\u2022', '\u2013', '\u2014',
    '\u02DC', '\u2122', '\u0161', '\u203A', '\u0153', '\u009D', '\u017E', '\u0178')

  /** WHATWG label → canonical name (the subset that matters on crawls). */
  private val Labels: Map[String, String] = Map(
    "utf-8" -> "utf-8", "utf8" -> "utf-8", "unicode-1-1-utf-8" -> "utf-8",
    "utf-16" -> "utf-16le", "utf-16le" -> "utf-16le", "utf-16be" -> "utf-16be",
    "iso-8859-1" -> "windows-1252", "iso8859-1" -> "windows-1252",
    "latin1" -> "windows-1252", "latin-1" -> "windows-1252",
    "l1" -> "windows-1252", "ascii" -> "windows-1252",
    "us-ascii" -> "windows-1252", "windows-1252" -> "windows-1252",
    "cp1252" -> "windows-1252", "x-cp1252" -> "windows-1252",
    "ansi_x3.4-1968" -> "windows-1252")

  def detect(bytes: Array[Byte]): Detection = {
    if (bytes == null) return Detection("utf-8", "empty")
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return Detection("utf-8", "bom")
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return Detection("utf-16le", "bom")
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return Detection("utf-16be", "bom")
    val (valid, multibyte) = validateUtf8(bytes)
    if (valid && multibyte) return Detection("utf-8", "valid-utf8")
    if (valid) return Detection("utf-8", "ascii")
    metaCharset(bytes) match {
      case Some(cs) => Detection(cs, "meta")
      case None => Detection("windows-1252", "fallback")
    }
  }

  /** Strict UTF-8 scan: (no malformed sequences?, any multi-byte seen?).
    * Rejects overlongs, surrogates, and > U+10FFFF like the real decoder.
    */
  private[core] def validateUtf8(bytes: Array[Byte]): (Boolean, Boolean) = {
    var i = 0
    var multibyte = false
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      if (b0 < 0x80) i += 1
      else {
        val len =
          if (b0 >= 0xC2 && b0 <= 0xDF) 2
          else if (b0 >= 0xE0 && b0 <= 0xEF) 3
          else if (b0 >= 0xF0 && b0 <= 0xF4) 4
          else return (false, multibyte)
        if (i + len > n) return (false, multibyte)
        var j = 1
        while (j < len) {
          val bj = bytes(i + j) & 0xFF
          if (bj < 0x80 || bj > 0xBF) return (false, multibyte)
          j += 1
        }
        val b1 = bytes(i + 1) & 0xFF
        if (b0 == 0xE0 && b1 < 0xA0) return (false, multibyte) // overlong
        if (b0 == 0xED && b1 > 0x9F) return (false, multibyte) // surrogate
        if (b0 == 0xF0 && b1 < 0x90) return (false, multibyte) // overlong
        if (b0 == 0xF4 && b1 > 0x8F) return (false, multibyte) // > U+10FFFF
        multibyte = true
        i += len
      }
    }
    (true, multibyte)
  }

  /** `charset=<label>` scan over the first 1024 bytes, ASCII
    * case-insensitive — covers `<meta charset=…>` and the http-equiv
    * Content-Type form without needing a parse.
    */
  private[core] def metaCharset(bytes: Array[Byte]): Option[String] = {
    val n = math.min(bytes.length, 1024)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      sb.append(if (b >= 0x41 && b <= 0x5A) (b + 32).toChar
                else if (b < 0x80) b.toChar else ' ')
      i += 1
    }
    val head = sb.toString
    val at = head.indexOf("charset=")
    if (at < 0) return None
    var j = at + "charset=".length
    // optional quotes
    if (j < head.length && (head.charAt(j) == '"' || head.charAt(j) == '\'')) j += 1
    val start = j
    while (j < head.length && (head.charAt(j).isLetterOrDigit ||
      "-_.".indexOf(head.charAt(j)) >= 0)) j += 1
    if (j == start) return None
    Labels.get(head.substring(start, j))
  }

  /** Decode per [[detect]] (BOMs stripped; malformed sequences in
    * BOM-declared payloads become U+FFFD like any strict-then-replace
    * decoder).
    */
  def decode(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length == 0) return ""
    val d = detect(bytes)
    d.charset match {
      case "utf-8" =>
        val off = if (d.reason == "bom") 3 else 0
        utf8Replace(bytes, off)
      case "utf-16le" =>
        utf16(bytes, 2, StandardCharsets.UTF_16LE)
      case "utf-16be" =>
        utf16(bytes, 2, StandardCharsets.UTF_16BE)
      case _ => cp1252(bytes)
    }
  }

  private def utf8Replace(bytes: Array[Byte], off: Int): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, off, bytes.length - off)).toString
  }

  private def utf16(bytes: Array[Byte], off: Int,
      cs: java.nio.charset.Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, off, bytes.length - off)).toString
  }

  private[core] def cp1252(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i) =
        if (b >= 0x80 && b <= 0x9F) Cp1252High(b - 0x80)
        else b.toChar
      i += 1
    }
    new String(out)
  }
}
