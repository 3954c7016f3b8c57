package graft.core

import scala.collection.mutable.ArrayBuffer

/** Quantity is `Union[int, str]` in the reference
  * (/root/reference/extractor/models/construction.py:17-20). Spark has no
  * union type, so it stays a sealed ADT in the core and splits into
  * (quantity_int, quantity_str) columns at the relational boundary.
  */
sealed trait Qty {
  /** Python truthiness: 0 and "" are falsy. */
  def truthy: Boolean = this match {
    case QInt(v) => v != 0L
    case QStr(s) => s.nonEmpty
  }
  def pyStr: String = this match { // str(quantity)
    case QInt(v) => v.toString
    case QStr(s) => s
  }
}
final case class QInt(v: Long) extends Qty
final case class QStr(s: String) extends Qty

/** One raw extracted item — the reference's item dict
  * (construction.py:184-194 text path, :799-827 table path).
  */
final case class RawItem(
    fixtureType: Option[String],
    quantity: Option[Qty],
    modelNumber: Option[String],
    dimensions: Option[String],
    mountingType: Option[String],
    specReference: Option[String],
    pageNumber: Long,
    tableNumber: Option[Long],
    rowNumber: Option[Long],
    rawText: Option[String],
    lineNumber: Option[Long]
)

/** Mutable working state for one item while the fold is open — mirrors the
  * reference's current_item dict, which `_enrich_item` mutates in place
  * (construction.py:651-758).
  */
final class OpenItem(
    var fixtureType: Option[String],
    var quantity: Option[Qty],
    var modelNumber: Option[String],
    var dimensions: Option[String],
    var mountingType: Option[String],
    var specReference: Option[String],
    var pageNumber: Long,
    val rawText: Option[String],
    val lineNumber: Option[Long]
) {
  def toRaw: RawItem = RawItem(fixtureType, quantity, modelNumber, dimensions,
    mountingType, specReference, pageNumber, None, None, rawText, lineNumber)
  /** construction.py:180 flush predicate — Python truthiness. */
  def meaningful: Boolean =
    fixtureType.exists(_.nonEmpty) || modelNumber.exists(_.nonEmpty) ||
      quantity.exists(_.truthy)
}

/** Detection-phase item_data dict (keys type/quantity/model/dimensions/
  * mounting/spec + the two internal spec-decimal flags,
  * construction.py:240,327-340,512-513).
  */
final class Detected {
  var tpe: Option[String] = None
  var quantity: Option[Qty] = None
  var model: Option[String] = None
  var dimensions: Option[String] = None
  var mounting: Option[String] = None
  var spec: Option[String] = None
  var hasSpecDecimal: Boolean = false
  var specDecimalValue: Option[String] = None

  def tpeTruthy = tpe.exists(_.nonEmpty)
  def qtyTruthy = quantity.exists(_.truthy)
  def modelTruthy = model.exists(_.nonEmpty)
  def dimsTruthy = dimensions.exists(_.nonEmpty)
  def mountTruthy = mounting.exists(_.nonEmpty)
  def specTruthy = spec.exists(_.nonEmpty)
}

/** Line-by-line port of the reference's `ConstructionParser`
  * (/root/reference/extractor/parsers/construction.py). Field evaluation
  * order (fixture → quantity → model → dimensions → mounting → spec →
  * final validations) is semantic — the spec-decimal flag written during
  * quantity extraction (construction.py:322-340) is read by later quantity
  * pattern iterations, and the post-hoc instruction/drawing filters run
  * after extraction (:516-559).
  */
object Construction {
  import Semantics._

  private def rxI(p: String) = Rx(p, ignoreCase = true)
  private def rxS(p: String) = Rx(p, ignoreCase = false)

  // Precompiled pattern tables + hoisted literal patterns. Rx.apply is a
  // cache lookup, but at one lookup per (line × pattern) even the
  // string-keyed fast path showed at ~3% of JFR parse samples; compiling
  // once into vals removes the per-line lookups entirely while leaving the
  // Semantics tables (the auditable parity surface) untouched. The
  // exclusion blocklist folds into ONE alternation — `exists(search)` over
  // patterns ≡ one search over `(?:p1)|(?:p2)|…` (pure boolean, no group
  // use), so ten scans per line become one.
  // The exclusion fold splits on prescreen-ability: patterns 0-3 start with
  // literal keywords (token-gated via FactExclude), patterns 4-9 are all
  // ^-anchored (cheap to scan, run always). OR of the two folds ≡ the
  // original single fold.
  private val excludeKeywordRx = rxI(excludePatterns.take(4).map(p => s"(?:$p)").mkString("|"))
  // all six start with ^: hoist it and test with lookingAt — find() over an
  // alternation of ^-anchored branches re-fails every branch at every
  // position, O(branches × length) of pure overhead
  private val excludeAnchoredRx =
    rxI(excludePatterns.drop(4).map(p => s"(?:${p.stripPrefix("^")})").mkString("|"))
  private val fixtureRx = fixturePatterns.map(rxI).toArray
  private val quantityRx = quantityPatterns.map(rxI).toArray
  private val modelRx = modelPatterns.map(rxI).toArray
  // digit-free subsets: model patterns 2-4 and spec patterns 5-8 require a
  // digit in every alternative, so digit-free lines only need the rest
  // (order within the subset is the original order — break semantics hold)
  private val modelRxNoDigit = Array(modelRx(0))
  private val emptyRx = Array.empty[Rx]
  private val dimensionRx = dimensionPatterns.map(rxI).toArray
  private val fullDimRx = fullDimPatterns.map(rxI).toArray
  private val mountingRx = mountingPatterns.map(rxI).toArray
  private val specRx = specPatterns.map(rxI).toArray
  private val specRxNoDigit = specRx.take(4)
  private val drawingRefRx = drawingReferencePatterns.map(rxS).toArray
  private val modelInLineRx = modelPatternsInLine.map(rxI).toArray

  private val actionVerbStartRx =
    rxI("""^\s*(up\s+to|see|refer|use|install|mount|connect|note|notice|warning)\s+""")
  private val capPhraseRx = rxS("""\b([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)+)""")
  private val dimShapeRx = rxS("\\d+\\s*[\"\\']\\s*[-–]?\\s*\\d+")
  private val numericOnlyRx = rxS("^[\\d\\s\\'\\\"\\-\\/\\.]+$")
  private val qtyDecimalRx = rxI("""\b(qty|quantity)[:\s]*\d+\.\d+""")
  private val specCtxRx = rxI("\\d+\\s*[\"\\']|OM-|MAU-|CH\\d+|model|part\\s*#")
  private val digitsOnlyRx = rxS("""^\d+$""")
  private val shortModelShapeRx = rxS("""^[A-Z]\d+$""")
  private val modelKeywordRx = rxI("""\b(model|part|pn|sku|cat|item\s*#)""")
  private val modelPrefixRx = rxS("""^[A-Z]{2,}-\d+""")
  private val modelShapeInLineRx = rxI("""[A-Z]{2,}-\d+|[A-Z]{1,3}\d{2,}""")
  private val dimCtxWordRx = rxI("""(diameter|dia|OD|ID|size|dimension|inch|inches|x\s*\d)""")
  private val dimCtxLineRx =
    rxI("[\"\\']|inch|inches|in|feet|ft|cm|mm|diameter|dia|ø|\"|\\'|x\\s*\\d")
  private val dimUnitsRx = rxI("[\"\\']|ø|inch|in|ft|cm|mm")
  private val eaQtyRx = rxI("""\b(\d+)\s*(ea|each|pcs|pieces|qty|quantity)""")
  private val specDecimalShapeRx = rxS("""^\d+\.\d+$""")
  private val enrichUnitsRx = rxI("[\"\\']|ø|inch|inches|in|ft|feet|cm|mm|diameter|dia")
  private val enrichCtxRx = rxI("(diameter|dia|OD|ID|inch|in|\"|\\'|ø|x\\s*\\d)")
  private val hyphenWsRx = rxS("""[-\s]+""")
  private val digitsRx = rxS("""\d+""")

  // Hand scans replacing upperAsciiRx/digitClassRx containment probes: the
  // per-call Matcher reset dominated the actual scan in JFR. Semantics are
  // exactly the compiled patterns': [A-Z] is ASCII-only (case-sensitive, no
  // folding); \d under UNICODE_CHARACTER_CLASS is \p{IsDigit} =
  // Character.isDigit over CODE POINTS (non-BMP digits included, hence the
  // codePointAt walk).
  private def hasUpperAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') return true
      i += 1
    }
    false
  }
  private def hasDigit(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x80) {
        if (c >= '0' && c <= '9') return true
        i += 1
      } else {
        val cp = s.codePointAt(i)
        if (Character.isDigit(cp)) return true
        i += Character.charCount(cp)
      }
    }
    false
  }

  // constant phrase table, uppercased once (not per line); the first-char
  // table gates the 15 startsWith probes behind one array load
  private val instructionPhrasesUpper = instructionPhrases.map(PyStr.upper).toArray
  private val instructionFirstChars: Array[Boolean] = {
    val arr = new Array[Boolean](128)
    instructionPhrasesUpper.foreach { p =>
      if (p.nonEmpty && p.charAt(0) < 128) arr(p.charAt(0)) = true
    }
    arr
  }

  // Literal-word prescreen for the fixture/mounting tables: every
  // alternative in fixturePatterns starts with a literal word followed by
  // \b or \s+, and every mounting alternative starts with one of a fixed
  // set of literal PREFIXES (prefix, not word: `wall[-\s]*hung` matches the
  // single token "wallhung"). So a line whose word set contains no fixture
  // first-word (resp. no word starting with a mounting prefix) cannot match
  // any pattern of that table, and the 10 (resp. 6) finditer scans can be
  // skipped. The scan is exact only for ASCII; any char ≥ 0x80 returns
  // (true, true) — inconclusive, run the full loops — because exotic case
  // folds (ſ→S) and combining marks could otherwise diverge from the
  // regexes' Unicode semantics. Soundness is pinned by ConstructionSpec's
  // prescreen property test.
  private val fixtureFirstWords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    List(
      // p1 fixtures        p2 pumps            p3 equipment
      "pipe", "fitting", "duct", "conduit", "fixture", "valve", "faucet",
      "sink", "toilet", "shower", "bathtub", "drain", "vent", "elbow", "tee",
      "coupling", "reducer", "adapter", "cap", "plug", "flange", "gasket",
      "hanger", "bracket", "mount",
      "pump", "circulating", "booster", "centrifugal",
      "equipment", "boiler", "heater", "tower", "cooling", "tank",
      "reservoir", "vessel", "chiller",
      // p4 stations        p5 connections      p6 packages
      "station", "wash", "eye", "safety", "emergency",
      "connection", "piping",
      "package",
      // p7/p8 shop         p9 materials        p10 generic
      "shop", "repair", "body", "paint", "booth",
      "fixtures", "mechanical",
      "abs", "pvc", "cpvc", "pex", "copper", "steel", "stainless",
      "galvanized", "cast", "brass", "bronze",
      "item", "component", "part", "unit", "assembly", "system"
    ).foreach(s.add)
    s
  }
  private val mountingFirstPrefixes: Array[String] = Array(
    "wall", "floor", "ceiling", "surface", "recessed", "concealed",
    "exposed", "flush", "undercounter", "countertop", "freestanding",
    "portable", "stationary", "fixed", "removable", "slip", "threaded",
    "welded", "bolted", "hanging", "suspended", "mounting")

  // Every alternative in the keyword exclusion patterns (excludePatterns
  // 0-3) starts with one of these words followed by \s or a trailing \b, so
  // the first word is always a COMPLETE token of the line.
  private val excludeFirstWords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    List("prohibited", "copyright", "reserved", "confidential", "proprietary",
      "use", "in", "strictly", "all", "page", "document",
      "revision", "date", "prepared", "approved").foreach(s.add)
    s
  }
  // The digit-free spec patterns (specPatterns 0-3) each start with a
  // literal keyword whose tail may run straight into word chars
  // ("specX", "ULtimate" — the second group is [A-Z0-9.-] under IGNORECASE,
  // so it eats lowercase letters too): prefix match, not equality.
  private val specFirstPrefixes: Array[String] = Array(
    "astm", "ansi", "ul", "csa", "asme", "nema", "nfpa", "awwa", "ipc",
    "iso", "din", "bs", "grade", "class", "type", "rating",
    "spec", "ref", "dwg", "drawing")

  // Every quantity-pattern alternative needs a qty/quantity token, a unit
  // keyword after digits, a '(', digit '.' digit, or a bare trailing
  // number (pattern 7's `|$)` arm). Pattern 7 has NO trailing \b, so its
  // keywords match as token PREFIXES ("7 eaend", "689pcsi…") — both
  // fuzz-found by FuzzFactsMain; prefix match, with qty/quantity included
  // for the glued/after-digits form ("7quantity").
  private val qtyPrefixes: Array[String] = Array(
    "ea", "pc", "pieces", "unit", "qty", "quantity",
    "lf", "ft", "feet", "sq", "square", "linear")
  // Every dimension-pattern alternative needs a quote, ø (non-ASCII ⇒
  // inconclusive anyway), an 'x' char, a length unit standalone-after-
  // digits or glued ("5mm"), or a dia/size keyword ending a token directly
  // followed (over \s/: only) by a digit-led token (patterns 10/18 have no
  // leading \b, so the keyword can END any token: "and 7" genuinely
  // matches via the 'D' alternative).
  // "inch" is a PREFIX, not an equality: dimension pattern 9 lets the dia
  // keyword glue straight onto the unit ("7inchdia", "141inchod" — \s* is
  // optional between them; fuzz-found by FuzzFactsMain). The others carry
  // a trailing \b, so equality is exact for them.
  private val dimUnitSuffixes: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    List("in", "ft", "feet", "cm", "mm", "m").foreach(s.add)
    s
  }

  // Every model-pattern alternative needs a model/part keyword token, a
  // token whose letters run straight into a digit ("K2032", IGNORECASE so
  // case-folded), or a letters-'-'-digits span ("OM-141" — tokenized as
  // letters, hyphen separator, digit-led token).
  private val modelFirstWords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    List("model", "part", "pn", "sku", "cat", "catalog", "item").foreach(s.add)
    s
  }

  private[core] val FactFixture = 1    // fixtureRx table may match
  private[core] val FactMount = 2      // mountingRx table may match
  private[core] val FactExclude = 4    // excludeKeywordRx may match
  private[core] val FactCapPair = 8    // capPhraseRx may match
  private[core] val FactSpec = 16     // specPatterns 0-3 may match
  private[core] val FactDimAnchor = 32 // dimensionRx table may match
  private[core] val FactQty = 64       // quantityRx table may match
  private[core] val FactModel = 128    // modelRx table may match
  private[core] val FactAll = 255

  /** One pass over the line computing which pattern tables can possibly
    * match (soundness: a cleared bit PROVES the table cannot match; a set
    * bit means "run the regexes"). Exact only for ASCII — any char ≥ 0x80
    * returns all bits, because exotic case folds and combining marks could
    * otherwise diverge from the regexes' Unicode semantics. Soundness of
    * every bit is pinned by PrescreenFactsSpec properties.
    *
    *  - FactFixture: a token equals a fixture-table first word.
    *  - FactMount: a token starts with a mounting prefix.
    *  - FactExclude: a token equals an exclusion-table first word.
    *  - FactCapPair: two CONSECUTIVE tokens both look like [A-Z][A-Za-z]+
    *    (capPhraseRx needs two such words separated by \s+; any non-word
    *    separator makes the tokens consecutive here too — conservative).
    *  - FactSpec: a token starts with a spec-table keyword prefix.
    */
  // Java \s under UNICODE_CHARACTER_CLASS ≙ Character.isWhitespace on
  // ASCII: \t, \n-\r (10-13), -, space.
  @inline private def isWsAscii(c: Char): Boolean =
    c == ' ' || c == '\t' || (c >= '\n' && c <= '\r') || (c >= 0x1C && c <= 0x1F)

  private[core] def lineFacts(line: String): Int = {
    val n = line.length
    var facts = 0
    var prevCapShape = false
    var prevEndsDigit = false    // last token's last char was a digit
    var prevEndsLetter = false   // last token's last char was a letter
    var pendingDimKw = false     // last token ended with a dia/size keyword
    var sepWsColonOnly = true    // separator since last token was \s/: only
    var sepHasHyphen = false     // separator since last token contained '-'
    var lastTokAllDigits = false
    var lastTokEnd = 0
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n && facts != FactAll) {
      val c = line.charAt(i)
      if (c >= 0x80) return FactAll // non-ASCII: inconclusive
      val isWord = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
      if (isWord) {
        sb.setLength(0)
        var j = i
        var ascii = true
        var hasX = false
        var hasDigitInTok = false
        while (j < n && {
          val cj = line.charAt(j)
          if (cj >= 0x80) { ascii = false; false }
          else if ((cj >= 'a' && cj <= 'z') || (cj >= 'A' && cj <= 'Z') ||
                   (cj >= '0' && cj <= '9') || cj == '_') {
            if (cj == 'x' || cj == 'X') hasX = true
            if (cj >= '0' && cj <= '9') hasDigitInTok = true
            sb.append(if (cj >= 'A' && cj <= 'Z') (cj + 32).toChar else cj); true
          } else false
        }) j += 1
        if (!ascii) return FactAll
        val w = sb.toString
        if (hasX) facts |= FactDimAnchor
        if (pendingDimKw && sepWsColonOnly && c >= '0' && c <= '9')
          facts |= FactDimAnchor
        val startsLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        if ((startsLetter && hasDigitInTok) ||
            (prevEndsLetter && sepHasHyphen && c >= '0' && c <= '9'))
          facts |= FactModel
        if ((facts & FactModel) == 0 && modelFirstWords.contains(w))
          facts |= FactModel
        if ((facts & FactFixture) == 0 && fixtureFirstWords.contains(w))
          facts |= FactFixture
        if ((facts & FactExclude) == 0 && excludeFirstWords.contains(w))
          facts |= FactExclude
        if ((facts & FactMount) == 0) {
          var k = 0
          while ((facts & FactMount) == 0 && k < mountingFirstPrefixes.length) {
            if (w.startsWith(mountingFirstPrefixes(k))) facts |= FactMount
            k += 1
          }
        }
        if ((facts & FactSpec) == 0) {
          var k = 0
          while ((facts & FactSpec) == 0 && k < specFirstPrefixes.length) {
            if (w.startsWith(specFirstPrefixes(k))) facts |= FactSpec
            k += 1
          }
        }
        // digit-prefix split: w = digits + rest ("3ea" → "ea")
        var r = 0
        while (r < w.length && w.charAt(r) >= '0' && w.charAt(r) <= '9') r += 1
        val allDigits = r == w.length
        if (!allDigits) {
          val rest = if (r == 0) w else w.substring(r)
          val glued = r > 0
          if ((facts & FactQty) == 0 &&
              (w == "qty" || w == "quantity" ||
               ((glued || prevEndsDigit) && {
                 var k = 0
                 var hit = false
                 while (!hit && k < qtyPrefixes.length) {
                   if (rest.startsWith(qtyPrefixes(k))) hit = true
                   k += 1
                 }
                 hit
               })))
            facts |= FactQty
          if ((facts & FactDimAnchor) == 0 && (glued || prevEndsDigit) &&
              (dimUnitSuffixes.contains(rest) || rest.startsWith("inch")))
            facts |= FactDimAnchor
        }
        val wl = w.charAt(w.length - 1)
        pendingDimKw = wl == 'd' || w.endsWith("dia") || w.endsWith("diameter") ||
          w.endsWith("size") || w.endsWith("dimension")
        prevEndsDigit = wl >= '0' && wl <= '9'
        prevEndsLetter = wl >= 'a' && wl <= 'z' // w is lowercased
        lastTokAllDigits = allDigits
        lastTokEnd = j
        sepWsColonOnly = true
        sepHasHyphen = false
        // capPhraseRx is case-SENSITIVE: shape check on the ORIGINAL chars
        val capShape = j - i >= 2 && {
          val c0 = line.charAt(i); val c1 = line.charAt(i + 1)
          c0 >= 'A' && c0 <= 'Z' &&
            ((c1 >= 'A' && c1 <= 'Z') || (c1 >= 'a' && c1 <= 'z'))
        }
        if (capShape && prevCapShape) facts |= FactCapPair
        prevCapShape = capShape
        i = j
      } else {
        if (c == '"' || c == '\'') facts |= FactDimAnchor
        else if (c == '(') facts |= FactQty
        else if (c == '.' && i > 0 && i + 1 < n &&
                 line.charAt(i - 1) >= '0' && line.charAt(i - 1) <= '9' &&
                 line.charAt(i + 1) >= '0' && line.charAt(i + 1) <= '9')
          facts |= FactQty
        if (!(isWsAscii(c) || c == ':')) sepWsColonOnly = false
        if (c == '-') sepHasHyphen = true
        i += 1
      }
    }
    // quantity pattern 7's `(\d{1,3})\s*(?:…|$)` arm: a bare number token
    // with only whitespace to end-of-line
    if ((facts & FactQty) == 0 && lastTokAllDigits) {
      var k = lastTokEnd
      var wsOnly = true
      while (wsOnly && k < n) {
        val c = line.charAt(k)
        if (c >= 0x80) return FactAll
        wsOnly = isWsAscii(c)
        k += 1
      }
      if (wsOnly) facts |= FactQty
    }
    facts
  }

  /** (mayMatchFixture, mayMatchMounting); (true, true) when inconclusive. */
  private[core] def wordPrescreen(line: String): (Boolean, Boolean) = {
    val f = lineFacts(line)
    ((f & FactFixture) != 0, (f & FactMount) != 0)
  }

  // ---------------------------------------------------------------- P2 fold
  /** extract_items (construction.py:153-214). */
  def extractItems(text: String, pageNum: Long): List[RawItem] = {
    val items = ArrayBuffer.empty[RawItem]
    val lines = PyStr.split(text, '\n')
    var current: OpenItem = null
    // Highest line index already enriched into `current` (-1 = none). The
    // reference's prev/current/next window (construction.py:196-208) feeds
    // each line to enrichItem up to three times per item; a repeat
    // enrichItem(item, line) is a provable no-op — every field gate is
    // close-only, an open-gate section re-matched against the SAME line
    // deterministically rewrites the value it already wrote (the only write
    // that leaves its gate open is quantity QInt(0), and every falsy
    // quantity write IS QInt(0)) — so consecutive windows advance past it
    // instead of re-running: ~3x fewer enrich regex scans, bit-identical
    // output (EnrichWindowSpec pins equivalence vs the literal 3-call fold).
    var enrichedUpTo = -1

    // Per-line memo across the fold: a context line is stripped/prescreened
    // once even though the detect pass and the enrich window both touch it
    // (lineFacts is a pure function of the stripped line, so reuse is
    // semantics-free; ~2x fewer prescreen scans on item-dense pages).
    val stripped = new Array[String](lines.length)
    var si = 0
    while (si < lines.length) { stripped(si) = PyStr.strip(lines(si)); si += 1 }
    val factsMemo = new Array[Int](lines.length)
    java.util.Arrays.fill(factsMemo, -1)
    def factsOf(k: Int): Int = {
      var f = factsMemo(k)
      if (f == -1) { f = lineFacts(stripped(k)); factsMemo(k) = f }
      f
    }

    var lineNum = 0
    while (lineNum < lines.length) {
      val line = stripped(lineNum)
      if (line.nonEmpty) {
        detectItemLineF(line, pageNum, lineNum, factsOf(lineNum)) match {
          case Some(d) =>
            if (current != null && current.meaningful) items += current.toRaw
            current = new OpenItem(
              fixtureType = d.tpe,
              quantity = d.quantity,
              modelNumber = d.model,
              dimensions = d.dimensions,
              mountingType = d.mounting,
              specReference = d.spec,
              pageNumber = pageNum,
              rawText = Some(line),
              lineNumber = Some(lineNum + 1L)
            )
            enrichedUpTo = -1
          case None =>
            if (current != null) {
              // prev / current / next context window (construction.py:196-208),
              // first-enrichment-only per the no-op proof above
              val lo = math.max(math.max(lineNum - 1, 0), enrichedUpTo + 1)
              val hi = math.min(lineNum + 1, lines.length - 1)
              var k = lo
              while (k <= hi) {
                val c = stripped(k)
                if (c.nonEmpty) enrichItemF(current, c, factsOf(k))
                k += 1
              }
              if (hi > enrichedUpTo) enrichedUpTo = hi
            }
        }
      }
      lineNum += 1
    }
    if (current != null && current.meaningful) items += current.toRaw
    items.toList
  }

  // ------------------------------------------------------ P3 line classifier
  /** _detect_item_line (construction.py:216-649). */
  def detectItemLine(line: String, pageNum: Long, lineNum: Long): Option[Detected] =
    detectItemLineF(line, pageNum, lineNum, lineFacts(line))

  /** detectItemLine with the prescreen precomputed (extractItems memoizes
    * it per line across the detect pass and the enrich window).
    */
  private[core] def detectItemLineF(
      line: String, pageNum: Long, lineNum: Long, facts: Int): Option[Detected] = {

    // exclusion regexes (:222-224) — keyword fold prescreened, anchored
    // fold always (equivalent to the original 10-pattern fold)
    if ((facts & FactExclude) != 0 && excludeKeywordRx.containsMatch(line)) return None
    if (excludeAnchoredRx.matchesAt(line)) return None

    // instruction-phrase prefixes (:227-230)
    val upperLine = PyStr.upper(line) // hoisted: reused by the vetoes below
    val lineUpper = PyStr.strip(upperLine)
    if (lineUpper.nonEmpty && (lineUpper.charAt(0) >= 128 ||
          instructionFirstChars(lineUpper.charAt(0))) &&
        instructionPhrasesUpper.exists(lineUpper.startsWith)) return None

    // action-verb starts (:233-234)
    if (actionVerbStartRx.matchesAt(line))
      return None

    // very short lines (:237-238)
    if (PyStr.len(PyStr.strip(line)) < 3) return None

    val d = new Detected
    val mayFixture = (facts & FactFixture) != 0
    val mayMount = (facts & FactMount) != 0
    // fixture types — longest match across all patterns (:243-254)
    var bestMatch: String = null
    var bestLen = 0
    (if (mayFixture) fixtureRx else emptyRx).foreach { rx =>
      rx.finditer(line).foreach { m =>
        val t = PyStr.strip(m.group0)
        if (PyStr.len(t) > bestLen) { bestMatch = t; bestLen = PyStr.len(t) }
      }
    }

    if (bestMatch != null) {
      // capitalized phrase before the match (:258-273)
      val fullPat = """\b([A-Z][A-Za-z\s]+?)\s*(?:""" + Rx.escape(bestMatch) +
        """|package|equipment|fixture|station|connection)"""
      rxI(fullPat).search(line) match {
        case Some(fm) =>
          val fixtureType = PyStr.strip(fm.group(1)) + " " + bestMatch
          d.tpe = Some(PyStr.title(dedupConsecutiveWords(fixtureType)))
        case None =>
          d.tpe = Some(PyStr.title(bestMatch))
      }
    } else if ((facts & FactCapPair) != 0) {
      // inferred capitalized multi-word phrase (:276-291); no IGNORECASE;
      // prescreened — needs two consecutive capitalized words
      capPhraseRx.search(line).foreach { cp =>
        val potential = PyStr.strip(cp.group(1))
        val isDimensionPattern = dimShapeRx.containsMatch(potential)
        val isNumericOnly = numericOnlyRx.matchesAt(PyStr.strip(potential))
        if (PyStr.splitWs(potential).length >= 2 && PyStr.len(potential) > 10 &&
            !isDimensionPattern && !isNumericOnly) {
          d.tpe = Some(potential)
        }
      }
    }

    // Digit prescreen: every quantity / dimension / full-dim pattern
    // requires `\d` to participate in any match, so a digit-free line
    // cannot match any of them — skipping the 8+19(+12) regex scans is
    // semantics-free (the loops below would fall through unmatched).
    val lineHasDigit = hasDigit(line)

    // quantities (:294-351) — FactQty prescreen, see lineFacts
    // the pattern loops below use `match` instead of Option.foreach: the
    // foreach closures captured the break vars, boxing them into
    // BooleanRefs on every call (visible in JFR allocation samples)
    var qtyBreak = !lineHasDigit || (facts & FactQty) == 0
    val qtyIt = quantityRx.iterator
    while (!qtyBreak && qtyIt.hasNext) {
      qtyIt.next().search(line) match { case None => (); case Some(m) =>
        try {
          val qtyStr = m.group(1)
          if (qtyStr == null) throw new NumberFormatException("no group") // ≙ IndexError-ish guard
          if (!qtyStr.contains('.')) PyInt.parse(qtyStr) // ≙ qty_num probe; ValueError → except

          // part-of-model veto (:303-317)
          var isPartOfModel = modelInLineRx.exists { mp =>
            mp.search(line).exists(mm => mm.group0.contains(qtyStr))
          }
          // instruction-context veto (:318-321)
          val contextBefore = PyStr.upper(PyStr.strip(line.substring(0, m.start)))
          if (List("UP TO", "SEE", "REFER TO", "USE").exists(ph => contextBefore.endsWith(ph)))
            isPartOfModel = true

          // decimal-is-spec heuristic (:322-340)
          var isSpecReference = false
          if (d.hasSpecDecimal) {
            if (d.specDecimalValue.contains(qtyStr) || qtyStr == d.spec.getOrElse(""))
              isSpecReference = true
          } else if (qtyStr.contains('.')) {
            if (!qtyDecimalRx.containsMatch(line)) {
              if (specCtxRx.containsMatch(line)) {
                isSpecReference = true
                if (!d.specTruthy) {
                  d.spec = Some(qtyStr)
                  d.hasSpecDecimal = true
                  d.specDecimalValue = Some(qtyStr)
                }
              }
            }
          }

          if (!isPartOfModel && !isSpecReference) {
            d.quantity = Some(
              if (qtyStr.contains('.')) QStr(qtyStr) else QInt(PyInt.parse(qtyStr)))
            qtyBreak = true
          }
        } catch { case _: NumberFormatException => () } // ≙ except (ValueError, IndexError): pass
      }
    }

    // model numbers (:353-405) — FactModel prescreen, see lineFacts
    val allModels = ArrayBuffer.empty[String]
    (if ((facts & FactModel) == 0) emptyRx
     else if (lineHasDigit) modelRx else modelRxNoDigit).foreach { rx =>
      rx.finditer(line).foreach { m =>
        val groups = m.groups
        if (groups.nonEmpty) {
          var gi = groups.length - 1
          var broke = false
          while (gi >= 0 && !broke) {
            val g = groups(gi)
            if (g != null && PyStr.strip(g).nonEmpty) {
              val model = PyStr.strip(g)
              if (!digitsOnlyRx.matchesAt(model) && PyStr.len(model) > 1 && PyStr.len(model) < 50) {
                if (PyStr.len(model) >= 2) {
                  var skipGroup = false
                  if (PyStr.len(model) <= 4 && shortModelShapeRx.matchesAt(model)) {
                    if (legalWords.exists(w => upperLine.contains(w))) skipGroup = true
                    else if (!modelKeywordRx.containsMatch(line)) skipGroup = true
                    else if (PyStr.splitWs(PyStr.strip(line)).length <= 2 &&
                             upperLine.contains(PyStr.upper(model))) skipGroup = true
                    else if (hasUpperAscii(model) && hasDigit(model)) {
                      if (!allModels.contains(model)) allModels += model
                    }
                  }
                  if (!skipGroup) broke = true // break at construction.py:387
                }
              }
            }
            gi -= 1
          }
        } else {
          // no-group path (:388-400) — unreachable with the shipped patterns
          val model = PyStr.strip(m.group0)
          if (PyStr.len(model) >= 3 && PyStr.len(model) < 30) {
            var skip = false
            if (PyStr.len(model) <= 4 && shortModelShapeRx.matchesAt(model)) {
              if (legalWords.exists(w => upperLine.contains(w))) skip = true
            }
            if (!skip && ((hasUpperAscii(model) && hasDigit(model)) ||
                modelPrefixRx.matchesAt(model))) {
              if (!allModels.contains(model)) allModels += model
            }
          }
        }
      }
    }
    if (allModels.nonEmpty) {
      d.model = Some(allModels.take(2).mkString(", "))
    }

    // dimensions (:407-486) — digit + FactDimAnchor prescreens
    var dimBreak = !lineHasDigit || (facts & FactDimAnchor) == 0
    val dimIt = dimensionRx.iterator
    while (!dimBreak && dimIt.hasNext) {
      dimIt.next().search(line) match { case None => (); case Some(m) =>
        val dimParts = m.groups.filter(g => g != null && g.nonEmpty)
        if (dimParts.nonEmpty) {
          val filtered = dimParts.filter { dim =>
            if (dim.contains('/') && PyStr.len(dim) <= 4) {
              val hasModel = modelShapeInLineRx.containsMatch(line)
              val hasInstruction =
                List("UP TO", "SEE", "REFER TO").exists(ph => upperLine.contains(ph))
              val dimCtx = dimCtxWordRx.containsMatch(line)
              !((hasModel || hasInstruction) && !dimCtx)
            } else true
          }
          if (filtered.nonEmpty) {
            val fullDimFound = fullDimRx.iterator
              .flatMap(fp => fp.search(line).map(fm => PyStr.strip(fm.group(1))))
              .nextOption()
            fullDimFound match {
              case Some(fd) =>
                d.dimensions = Some(fd); dimBreak = true
              case None if filtered.length >= 2 =>
                d.dimensions = Some(filtered.mkString(" x ")); dimBreak = true
              case None =>
                val singleDim = filtered.head
                val isStandaloneNumber = digitsOnlyRx.matchesAt(PyStr.strip(singleDim))
                val hasDimensionContext = dimCtxLineRx.containsMatch(line)
                val hasUnitsInDim = dimUnitsRx.containsMatch(singleDim)
                if (hasUnitsInDim || (hasDimensionContext && !isStandaloneNumber)) {
                  d.dimensions = Some(singleDim); dimBreak = true
                } // else: continue to next pattern (:484)
            }
          }
        }
      }
    }

    // mounting (:489-494) — word prescreen, see above
    var mountBreak = !mayMount
    val mountIt = mountingRx.iterator
    while (!mountBreak && mountIt.hasNext) {
      mountIt.next().search(line) match { case None => (); case Some(m) =>
        d.mounting = Some(PyStr.strip(m.group0))
        mountBreak = true
      }
    }

    // specs (:496-514) — patterns 0-3 are keyword-led (FactSpec gates
    // them); 4-7 need a digit. Skipping a non-matchable prefix of the
    // break-at-first-match loop preserves its order semantics.
    var specBreak = false
    val maySpecKw = (facts & FactSpec) != 0
    val specIt =
      (if (lineHasDigit) { if (maySpecKw) specRx else specRx.drop(4) }
       else { if (maySpecKw) specRxNoDigit else emptyRx }).iterator
    while (!specBreak && specIt.hasNext) {
      specIt.next().search(line) match { case None => (); case Some(m) =>
        val groups = m.groups
        val specStr =
          if (groups.nonEmpty) PyStr.strip(groups.filter(g => g != null && g.nonEmpty).mkString(" "))
          else PyStr.strip(m.group0)
        if (specStr.nonEmpty) {
          d.spec = Some(specStr)
          if (specStr.contains('.') && specDecimalShapeRx.matchesAt(specStr)) {
            d.hasSpecDecimal = true
            d.specDecimalValue = Some(specStr)
          }
          specBreak = true
        }
      }
    }

    // final instruction re-validation (:516-533)
    val lineStripped = PyStr.upper(PyStr.strip(line))
    val instructionIndicators =
      lineStripped.startsWith("UP TO") || lineStripped.startsWith("SEE ") ||
        lineStripped.startsWith("REFER ") || lineStripped.startsWith("USE ") ||
        lineStripped.startsWith("INSTALL ") || lineStripped.startsWith("MOUNT ") ||
        lineStripped.startsWith("CONNECT ") || lineStripped.contains("SEE PAGE") ||
        lineStripped.contains("SEE DRAWING") || lineStripped.contains("SEE SPEC") ||
        lineStripped.contains("REFER TO")
    if (instructionIndicators) return None

    // drawing/line reference filter (:535-559)
    if (drawingRefRx.exists(p => p.matchesAt(lineStripped))) {
      // line_stripped == line.strip().upper() always holds (:546) — whole-line branch
      if (!d.specTruthy) d.spec = Some(PyStr.strip(line))
      if (d.tpe.contains(PyStr.strip(line))) d.tpe = None
      if (!(d.modelTruthy || d.qtyTruthy || d.dimsTruthy)) return None
    }

    // strong indicators (:561-593)
    var hasStrong = false
    if (d.tpeTruthy && bestMatch != null) hasStrong = true
    if (d.qtyTruthy && d.modelTruthy) hasStrong = true
    if (d.modelTruthy) {
      if (d.mountTruthy || d.specTruthy || d.tpeTruthy) hasStrong = true
      else if (d.qtyTruthy) hasStrong = true
    }
    if (d.qtyTruthy) {
      if (eaQtyRx.containsMatch(line))
        hasStrong = true
    }

    if (!hasStrong) return None

    // inferred type from first words (:598-622)
    if (!d.tpeTruthy && (d.qtyTruthy || d.modelTruthy)) {
      val words = PyStr.splitWs(line)
      if (words.nonEmpty) {
        val potential = PyStr.strip(words.take(3).mkString(" "))
        val isDimension = dimShapeRx.containsMatch(potential)
        val isNumeric = numericOnlyRx.matchesAt(PyStr.strip(potential))
        val excluded = inferredTypeExcludePhrases.exists(ph => PyStr.upper(potential).contains(ph))
        if (!(excluded || isDimension || isNumeric) && PyStr.len(potential) < 40)
          d.tpe = Some(potential)
      }
    }

    // the quantity-vs-spec_reference cleanup at construction.py:628-633 reads
    // key 'spec_reference', which is never set in item_data (the key is
    // 'spec') — provably dead; kept out.

    // duplicate-word fix (:636-644) — no .title() this time
    if (d.tpeTruthy) d.tpe = d.tpe.map(dedupConsecutiveWords)

    Some(d)
  }

  /** Consecutive-duplicate-word removal (construction.py:263-273, 636-644). */
  def dedupConsecutiveWords(s: String): String = {
    val words = PyStr.splitWs(s)
    val out = ArrayBuffer.empty[String]
    var prev: String = null
    words.foreach { w =>
      if (PyStr.upper(w) != prev) {
        out += w
        prev = PyStr.upper(w)
      }
    }
    out.mkString(" ")
  }

  // ---------------------------------------------------------- P4 enrichment
  /** _enrich_item (construction.py:651-758) — mutates the open item.
    * Enrichment is deliberately looser than detection (no vetoes): a context
    * line "SEE PAGE 5" contributes quantity 5.
    */
  def enrichItem(item: OpenItem, line: String): Unit =
    enrichItemF(item, line, lineFacts(line))

  /** enrichItem with the prescreen precomputed (see detectItemLineF). */
  private[core] def enrichItemF(item: OpenItem, line: String, facts: Int): Unit = {
    // digit prescreen (see detectItemLine): quantity/dimension patterns
    // all require \d, so digit-free context lines skip those loops;
    // lineFacts gates the quantity/dimension/mounting tables (same
    // soundness contract as in detectItemLine, one scan for all three)
    val lineHasDigit = hasDigit(line)

    // quantity (:654-667)
    if (!item.quantity.exists(_.truthy)) {
      var brk = !lineHasDigit || (facts & FactQty) == 0
      val it = quantityRx.iterator
      while (!brk && it.hasNext) {
        it.next().search(line) match { case None => (); case Some(m) =>
          try {
            val qtyStr = m.group(1)
            if (qtyStr == null) throw new NumberFormatException("no group")
            item.quantity = Some(
              if (qtyStr.contains('.')) QStr(qtyStr) else QInt(PyInt.parse(qtyStr)))
          } catch { case _: NumberFormatException => () }
          brk = true // break sits outside the try (construction.py:667)
        }
      }
    }

    // model (:670-685) — FactModel prescreen, see lineFacts
    if (!item.modelNumber.exists(_.nonEmpty)) {
      var brk = (facts & FactModel) == 0
      val it = (if (lineHasDigit) modelRx else modelRxNoDigit).iterator
      while (!brk && it.hasNext) {
        it.next().search(line) match { case None => (); case Some(m) =>
          val groups = m.groups
          if (groups.nonEmpty) {
            var gi = groups.length - 1
            var inner = false
            while (gi >= 0 && !inner) {
              val g = groups(gi)
              if (g != null && PyStr.strip(g).nonEmpty) {
                item.modelNumber = Some(PyStr.strip(g))
                inner = true
              }
              gi -= 1
            }
          } else item.modelNumber = Some(PyStr.strip(m.group0))
          brk = true
        }
      }
    }

    // dimensions (:689-717) — digit + FactDimAnchor prescreens
    if (!item.dimensions.exists(_.nonEmpty)) {
      var brk = !lineHasDigit || (facts & FactDimAnchor) == 0
      val it = dimensionRx.iterator
      while (!brk && it.hasNext) {
        it.next().search(line) match { case None => (); case Some(m) =>
          val dimParts = m.groups.filter(g => g != null)
            .map(PyStr.strip).filter(_.nonEmpty)
          if (dimParts.nonEmpty) {
            if (dimParts.length > 1) item.dimensions = Some(dimParts.mkString(" x "))
            else {
              val singleDim = dimParts.head
              val isStandaloneNumber = digitsOnlyRx.matchesAt(PyStr.strip(singleDim))
              val hasUnits = enrichUnitsRx.containsMatch(singleDim)
              val hasContext = enrichCtxRx.containsMatch(line)
              if (hasUnits || (hasContext && !isStandaloneNumber))
                item.dimensions = Some(singleDim)
            }
          }
          brk = true
        }
      }
    }

    // mounting (:720-730) — word prescreen, see detectItemLine
    if (!item.mountingType.exists(_.nonEmpty)) {
      var brk = (facts & FactMount) == 0
      val it = mountingRx.iterator
      while (!brk && it.hasNext) {
        it.next().search(line) match { case None => (); case Some(m) =>
          val mounting0 = PyStr.strip(m.group0)
          if (mounting0.nonEmpty) {
            var mounting = hyphenWsRx.p.matcher(PyStr.lower(mounting0)).replaceAll("-")
            mounting = mounting.replace("mounting", "mount").replace("hung", "mount")
            item.mountingType = Some(PyStr.title(mounting))
          }
          brk = true
        }
      }
    }

    // spec (:733-758) — may overwrite page_number from a page reference;
    // patterns 0-3 are keyword-led (FactSpec), 4-7 need a digit
    if (!item.specReference.exists(_.nonEmpty)) {
      var brk = false
      var pi = if ((facts & FactSpec) != 0) 0 else 4
      val nSpec = if (lineHasDigit) specRx.length else specRxNoDigit.length
      while (!brk && pi < nSpec) {
        val pat = specPatterns(pi)
        specRx(pi).search(line) match { case None => (); case Some(m) =>
          val groups = m.groups
          val specStr =
            if (groups.nonEmpty) PyStr.strip(groups.filter(g => g != null && g.nonEmpty).mkString(" "))
            else PyStr.strip(m.group0)
          if (specStr.nonEmpty) item.specReference = Some(specStr)
          val patLower = PyStr.lower(pat)
          if (patLower.contains("page") || patLower.contains("pg")) {
            digitsRx.search(specStr).foreach { pm =>
              try item.pageNumber = PyInt.parse(pm.group0)
              catch { case _: NumberFormatException => () }
            }
          }
          brk = true
        }
        pi += 1
      }
    }
  }

  // ------------------------------------------------------------- P5 tables
  /** parse_tables (construction.py:760-829). Cells are Option[String]
    * (pdfplumber emits None for empty cells).
    */
  def parseTables(tables: Seq[Seq[Seq[Option[String]]]], pageNum: Long): List[RawItem] = {
    val items = ArrayBuffer.empty[RawItem]
    tables.zipWithIndex.foreach { case (table, tableIdx) =>
      if (table != null && table.length >= 2) {
        val headers = table.head.map {
          case Some(cell) if cell.nonEmpty => PyStr.lower(PyStr.strip(cell))
          case _                           => ""
        }
        // header → field map: first matching field wins per column (:789-795)
        val headerMap = scala.collection.mutable.LinkedHashMap.empty[Int, String]
        headers.zipWithIndex.foreach { case (header, colIdx) =>
          columnMapping.iterator
            .find { case (_, keywords) => keywords.exists(header.contains) }
            .foreach { case (field, _) => headerMap(colIdx) = field }
        }

        table.tail.zipWithIndex.foreach { case (row, rowIdx0) =>
          val rowIdx = rowIdx0 + 1
          var fixtureType: Option[String] = None
          var quantity: Option[Qty] = None
          var quantitySet = false
          var model: Option[String] = None; var modelSet = false
          var dims: Option[String] = None; var dimsSet = false
          var mounting: Option[String] = None; var mountingSet = false
          var spec: Option[String] = None; var specSet = false
          var fixtureSet = false

          row.zipWithIndex.foreach { case (cellOpt, colIdx) =>
            headerMap.get(colIdx).foreach { field =>
              val value = cellOpt.map(PyStr.strip).getOrElse("")
              if (field == "quantity" && value.nonEmpty) {
                // first \d+ in the cell (:812-815); no digits → key not set
                digitsRx.search(value).foreach { qm =>
                  quantity = Some(QInt(PyInt.parse(qm.group0))); quantitySet = true
                }
              } else {
                val v = if (value.nonEmpty) Some(value) else None
                field match {
                  case "fixture_type"   => fixtureType = v; fixtureSet = true
                  case "quantity"       => quantity = None; quantitySet = true // empty cell → explicit None
                  case "model_number"   => model = v; modelSet = true
                  case "dimensions"     => dims = v; dimsSet = true
                  case "mounting_type"  => mounting = v; mountingSet = true
                  case "spec_reference" => spec = v; specSet = true
                  case _                => ()
                }
              }
            }
          }
          val _ = (quantitySet, modelSet, dimsSet, mountingSet, specSet, fixtureSet)

          val mk = (ft: Option[String]) => RawItem(ft, quantity, model, dims, mounting,
            spec, pageNum, Some(tableIdx + 1L), Some(rowIdx.toLong), None, None)
          // :819-827 — accept predicate uses Python truthiness
          if (fixtureType.exists(_.nonEmpty) || quantity.exists(_.truthy) || model.exists(_.nonEmpty)) {
            items += mk(fixtureType)
          } else if (dims.exists(_.nonEmpty) || mounting.exists(_.nonEmpty) || spec.exists(_.nonEmpty)) {
            if (row.nonEmpty && row.head.exists(_.nonEmpty)) {
              items += mk(Some(PyStr.strip(row.head.get)))
            }
          }
        }
      }
    }
    items.toList
  }
}
