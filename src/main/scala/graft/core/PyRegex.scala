package graft.core

import java.util.regex.{Matcher, MatchResult, Pattern}

/** Python `re` dialect shim over `java.util.regex`.
  *
  * - Python `re` on `str` is Unicode-aware for `\d \w \s \b` → compile with
  *   UNICODE_CHARACTER_CLASS.
  * - `re.IGNORECASE` on `str` does Unicode case folding → CASE_INSENSITIVE
  *   | UNICODE_CASE.
  * - `re.match` anchors at the start only → `Matcher.lookingAt`.
  * - `findall` returns group(1) strings when the pattern has exactly one
  *   capture group ('' for a non-participating group) — the reference's
  *   phone entity depends on this quirk
  *   (/root/reference/extractor/parsers/standard.py:14,33).
  */
final class Rx private (val source: String, val p: Pattern) {
  private val nGroups = p.matcher("").groupCount()

  /** re.search → first match anywhere, or None. */
  def search(s: String): Option[Mtch] = {
    val m = p.matcher(s)
    if (m.find()) Some(new Mtch(m.toMatchResult)) else None
  }

  def containsMatch(s: String): Boolean = p.matcher(s).find()

  /** re.match → match anchored at position 0, or None. */
  def matchAt(s: String): Option[Mtch] = {
    val m = p.matcher(s)
    if (m.lookingAt()) Some(new Mtch(m.toMatchResult)) else None
  }

  def matchesAt(s: String): Boolean = p.matcher(s).lookingAt()

  /** re.finditer — non-overlapping matches left to right. */
  def finditer(s: String): List[Mtch] = {
    val m = p.matcher(s)
    val out = List.newBuilder[Mtch]
    while (m.find()) out += new Mtch(m.toMatchResult)
    out.result()
  }

  /** re.findall for patterns with 0 or 1 capture group (all the reference
    * needs): 0 groups → full matches; 1 group → group-1 values with '' for
    * a group that did not participate.
    */
  def findall(s: String): List[String] = {
    require(nGroups <= 1, s"findall tuple semantics not implemented for $source")
    val m = p.matcher(s)
    val out = List.newBuilder[String]
    while (m.find()) {
      if (nGroups == 0) out += m.group(0)
      else { val g = m.group(1); out += (if (g == null) "" else g) }
    }
    out.result()
  }
}

final class Mtch(r: MatchResult) {
  def group0: String = r.group(0)
  /** group(i) — null when the group did not participate (≙ Python None). */
  def group(i: Int): String = r.group(i)
  def groupOpt(i: Int): Option[String] = Option(r.group(i))
  def start: Int = r.start()
  def end: Int = r.end()
  def groupCount: Int = r.groupCount()
  /** match.groups() — Seq of nullable strings. */
  def groups: IndexedSeq[String] = (1 to r.groupCount()).map(r.group)
}

object Rx {
  private val base = Pattern.UNICODE_CHARACTER_CLASS
  private val ic = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE

  private val cache = new java.util.concurrent.ConcurrentHashMap[(String, Boolean), Rx]()

  def apply(pattern: String, ignoreCase: Boolean = false): Rx =
    cache.computeIfAbsent(
      (pattern, ignoreCase),
      { case (pat, icase) => new Rx(pat, Pattern.compile(pat, if (icase) base | ic else base)) }
    )

  /** re.escape (Python ≥3.7): backslash-escape only special characters. */
  private val escapeSet = "()[]{}?*+-|^$\\.&~# \t\n\r\f".toSet
  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach { c => if (escapeSet(c)) { sb.append('\\'); sb.append(c) } else sb.append(c) }
    sb.toString
  }
}
