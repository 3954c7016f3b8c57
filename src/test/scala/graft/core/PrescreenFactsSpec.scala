package graft.core

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Soundness of [[Construction.lineFacts]]: a CLEARED bit must prove the
  * corresponding pattern table cannot match the line (set bits promise
  * nothing). Each property rebuilds the gated regexes from the Semantics
  * tables — the same folds production compiles — and asserts no match on
  * any line whose bit is clear.
  */
class PrescreenFactsSpec extends AnyFunSuite {

  private def rxI(p: String) = Rx(p, ignoreCase = true)

  private val excludeKeywordRx =
    rxI(Semantics.excludePatterns.take(4).map(p => s"(?:$p)").mkString("|"))
  private val excludeAllRx =
    rxI(Semantics.excludePatterns.map(p => s"(?:$p)").mkString("|"))
  private val excludeAnchoredRx =
    rxI(Semantics.excludePatterns.drop(4).map(p => s"(?:$p)").mkString("|"))
  private val capPhraseRx = Rx("""\b([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)+)""")
  private val specKwRx = Semantics.specPatterns.take(4).map(rxI)
  private val quantityRx = Semantics.quantityPatterns.map(rxI)
  private val dimensionRx = Semantics.dimensionPatterns.map(rxI)
  private val modelRx = Semantics.modelPatterns.map(rxI)
  private val anchoredHoisted =
    rxI(Semantics.excludePatterns.drop(4).map(p => s"(?:${p.stripPrefix("^")})").mkString("|"))

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  // Adversarial line pool: keyword hits, prefix near-misses, case traps,
  // punctuation-separated capitals, unicode, raw ascii noise.
  private val lines: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    3 -> Gen.oneOf(
      "all rights reserved", "ALL RIGHTS RESERVED", "Copyright 2024 Example",
      "strictly prohibited by law", "page 12", "pageant of the year",
      "document control #7", "documented history", "revision date 2024",
      "prepared by J. Doe", "approval pending", "approved by QA",
      "IN PART or in whole", "used in whole", "indoors"),
    3 -> Gen.oneOf(
      "ASTM B88 copper", "astm-b88", "ULtimate power", "UL 90 rated",
      "ultra violet", "class A finish", "classic rock", "type 2 cement",
      "typical layout", "grade 60 rebar", "gradual slope", "ratings high",
      "spec: 22 40 00", "specX99", "specifically", "reference R-1",
      "refX", "refried beans", "dwg. 44", "drawing A-1", "drawings list",
      "ISO 9001", "isolated valve", "DIN rail", "dinner menu", "BS 1363",
      "bseries", "NEMA 4X", "CSA certified", "ASME B16", "NFPA 13",
      "AWWA C900", "IPC section"),
    3 -> Gen.oneOf(
      "Valve Package", "Va Lve", "A B", "Ab Cd", "A1b C2d", "Ab3 Cd",
      "Ab, Cd", "Ab,Cd", "Ab  Cd", "Abc\tDef", "abc Def Ghi", "X Y Z",
      "Abc def Ghi", "McDonald Std", "IBM PC", "eXtreme Case", "_Ab Cd_",
      "3Ab Cd", "Ab 3Cd", "Ab3Cd Ef"),
    1 -> Gen.oneOf("Ø 25 mm Rør", "ユニット 3 個", "naïve Case Pair", "Ab Çd"),
    2 -> Gen.listOf(Gen.oneOf("page", "Ab", "Cd", "spec", "7", "x", ",", " ",
      "ALL", "use", "in", "type", "UL", "-", ".", "Q1", "Zz")).map(_.mkString(" ")),
    3 -> Gen.oneOf(
      "qty 3", "QTY: 0", "quantity: 12", "3ea", "3 ea", "3, ea", "5 each",
      "12 pcs", "7pc", "4 units", "90 lf", "14 sq ft", "3 linear feet",
      "1.5", "a 1.5 b", "(3)", "room (12)", "Valve Box (4)", "end 42",
      "end 42 ", "42 end", "12345", "end 42.", "42", "and 7",
      "road: 66", "D: 5", "d5", "id 3", "OD: 7", "media 5", "resize: 9",
      "dimensions: 24", "dimension: 24", "size 8", "5mm", "5.5mm", "5 mm",
      "5-mm", "24x36", "24 x 36", "2X4", "5 in", "went in 2024", "3 in.",
      "9 ft", "8feet", "1-1/2\" drain", "25 cm pipe", "5 m", "the m word",
      "diameter 5", "xdiameter 6", "no anchors here at all", "year 2024 done",
      "Model K-2032", "model: ABC", "models galore", "part # XK-99", "pn 44",
      "sku: A9", "cat# 7", "item #3", "catalog #12", "K2032", "covid19",
      "OM-141", "om-141", "OM - 141", "AB-C12", "9AB-12", "A-1", "X9",
      "_AB-12", "ab_12", "2024-01-02", "a-b-c", "7-11 store", "item"),
    1 -> Gen.listOf(Gen.oneOf("42", "qty", "ea", "d", "dia", ":", ".", "(",
      ")", "\"", "'", "x", "mm", "in", "1.5", " ", "\t", "word", "Ab",
      "", "end")).map(_.mkString(" "))
  )

  test("cleared FactExclude proves the keyword exclusion fold cannot match") {
    check(Prop.forAll(lines) { s =>
      (Construction.lineFacts(s) & Construction.FactExclude) != 0 ||
        !excludeKeywordRx.containsMatch(s)
    })
  }

  test("cleared FactCapPair proves capPhraseRx cannot match") {
    check(Prop.forAll(lines) { s =>
      (Construction.lineFacts(s) & Construction.FactCapPair) != 0 ||
        capPhraseRx.search(s).isEmpty
    })
  }

  test("cleared FactSpec proves spec patterns 0-3 cannot match") {
    check(Prop.forAll(lines) { s =>
      (Construction.lineFacts(s) & Construction.FactSpec) != 0 ||
        specKwRx.forall(_.search(s).isEmpty)
    })
  }

  test("cleared FactQty proves the quantity table cannot match") {
    check(Prop.forAll(lines) { s =>
      (Construction.lineFacts(s) & Construction.FactQty) != 0 ||
        quantityRx.forall(_.search(s).isEmpty)
    })
  }

  test("cleared FactDimAnchor proves the dimension table cannot match") {
    check(Prop.forAll(lines) { s =>
      (Construction.lineFacts(s) & Construction.FactDimAnchor) != 0 ||
        dimensionRx.forall(_.search(s).isEmpty)
    })
  }

  test("cleared FactModel proves the model table cannot match") {
    check(Prop.forAll(lines) { s =>
      (Construction.lineFacts(s) & Construction.FactModel) != 0 ||
        modelRx.forall(_.search(s).isEmpty)
    })
  }

  test("keyword-fold OR anchored-fold ≡ the original 10-pattern fold") {
    check(Prop.forAll(lines) { s =>
      (excludeKeywordRx.containsMatch(s) || excludeAnchoredRx.containsMatch(s)) ==
        excludeAllRx.containsMatch(s)
    })
  }

  test("^-hoisted anchored fold via lookingAt ≡ per-pattern find") {
    check(Prop.forAll(lines) { s =>
      anchoredHoisted.matchesAt(s) ==
        Semantics.excludePatterns.drop(4).exists(p => rxI(p).containsMatch(s))
    })
  }

  test("fixture/mounting bits agree with the legacy wordPrescreen tuple") {
    check(Prop.forAll(lines) { s =>
      val f = Construction.lineFacts(s)
      Construction.wordPrescreen(s) ==
        (((f & Construction.FactFixture) != 0, (f & Construction.FactMount) != 0))
    })
  }
}
