package graft.core

import java.util.SplittableRandom

/** High-volume soundness fuzz for [[Construction.lineFacts]] — the
  * prescreen bits must NEVER clear while their pattern table still
  * matches. PrescreenFactsSpec runs 500 ScalaCheck cases per property in
  * the suite; this main hammers millions of char-level random lines
  * (biased toward the anchors: digits, quotes, hyphens, keywords, glued
  * tokens) for release-grade confidence. Exits non-zero on the first
  * violation with the offending line.
  *
  * Usage: Test/runMain graft.core.FuzzFactsMain [nLines] [seed]
  */
object FuzzFactsMain {
  private def rxI(p: String) = Rx(p, ignoreCase = true)

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val seed = if (args.length > 1) args(1).toLong else 42L
    val rnd = new SplittableRandom(seed)

    val excludeKeywordRx =
      rxI(Semantics.excludePatterns.take(4).map(p => s"(?:$p)").mkString("|"))
    val anchoredHoisted =
      rxI(Semantics.excludePatterns.drop(4).map(p => s"(?:${p.stripPrefix("^")})").mkString("|"))
    val anchoredOriginal = Semantics.excludePatterns.drop(4).map(rxI)
    val capPhraseRx = Rx("""\b([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)+)""")
    val specKwRx = Semantics.specPatterns.take(4).map(rxI)
    val quantityRx = Semantics.quantityPatterns.map(rxI)
    val dimensionRx = Semantics.dimensionPatterns.map(rxI)
    val modelRx = Semantics.modelPatterns.map(rxI)

    val words = Array("qty", "quantity", "ea", "each", "pcs", "pc", "unit",
      "units", "lf", "ft", "feet", "sq", "square", "linear", "in", "inch",
      "inches", "cm", "mm", "m", "d", "dia", "diameter", "od", "id", "size",
      "dimension", "dimensions", "model", "part", "pn", "sku", "cat",
      "catalog", "item", "page", "all", "use", "date", "revision", "spec",
      "ref", "dwg", "drawing", "type", "grade", "class", "UL", "ASTM",
      "and", "end", "word", "Ab", "Cd", "K2032", "OM", "141", "42", "7",
      "1.5", "A", "x", "X", "media", "resize", "road")
    val seps = Array(" ", "  ", "\t", ",", ", ", ":", ": ", "-", " - ", ".",
      "(", ")", "\"", "'", "#", "/", ";", "", " :", "", "")

    def randLine(): String = {
      val sb = new java.lang.StringBuilder
      val parts = rnd.nextInt(12)
      var k = 0
      while (k < parts) {
        if (rnd.nextInt(4) == 0) { // raw char noise
          val len = rnd.nextInt(6)
          var q = 0
          while (q < len) { sb.append((32 + rnd.nextInt(95)).toChar); q += 1 }
        } else sb.append(words(rnd.nextInt(words.length)))
        sb.append(seps(rnd.nextInt(seps.length)))
        k += 1
      }
      sb.toString
    }

    var i = 0
    var bad = 0
    while (i < n) {
      val s = randLine()
      val f = Construction.lineFacts(s)
      def die(which: String): Unit = {
        Console.err.println(s"VIOLATION [$which] facts=$f line=${s.replace("", "\\u001C")}")
        bad += 1
      }
      if ((f & Construction.FactExclude) == 0 && excludeKeywordRx.containsMatch(s)) die("exclude")
      if (anchoredHoisted.matchesAt(s) != anchoredOriginal.exists(_.containsMatch(s))) die("anchored-hoist")
      if ((f & Construction.FactCapPair) == 0 && capPhraseRx.search(s).isDefined) die("cappair")
      if ((f & Construction.FactSpec) == 0 && specKwRx.exists(_.search(s).isDefined)) die("spec")
      if ((f & Construction.FactQty) == 0)
        quantityRx.zipWithIndex.foreach { case (rx, pi) =>
          rx.search(s).foreach(m => die(s"qty p$pi [${m.group0}]")) }
      if ((f & Construction.FactDimAnchor) == 0)
        dimensionRx.zipWithIndex.foreach { case (rx, pi) =>
          rx.search(s).foreach(m => die(s"dim p$pi [${m.group0}]")) }
      if ((f & Construction.FactModel) == 0)
        modelRx.zipWithIndex.foreach { case (rx, pi) =>
          rx.search(s).foreach(m => die(s"model p$pi [${m.group0}]")) }
      if (bad > 5) { Console.err.println("too many violations, aborting"); sys.exit(1) }
      i += 1
    }
    if (bad > 0) sys.exit(1)
    println(s"[fuzz-facts] $n lines, 0 violations (seed $seed)")
  }
}
