package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** J1–J3 greedy fuzzy merge vs ground truth captured from the reference's
  * `ConstructionExtractionStrategy._merge_regex_and_llm_items`
  * (extraction_service.py:318-447) run on a deterministic fake second
  * source (the LLM itself stays disabled offline, mirroring the
  * no-API-key default).
  */
class LlmMergeSpec extends AnyFunSuite {

  private def item(fixture: String = null, qty: Qty = null, model: String = null,
                   dims: String = null, mount: String = null, spec: String = null,
                   page: Long = 0L, line: Option[Long] = None,
                   raw: Option[String] = None): RawItem =
    RawItem(Option(fixture), Option(qty), Option(model), Option(dims),
      Option(mount), Option(spec), page, None, None, raw, line)

  private val regexItems = Seq(
    item("Valve Package", QInt(3), "VP-77", mount = "", page = 1,
      line = Some(1L), raw = Some("r1")),
    item("Pump", page = 2, line = Some(4L), raw = Some("r2")))

  private val llmItems = IndexedSeq(
    item("Circulating Pump", QInt(7), "CP-9", dims = "2 x 4", page = 2),
    item("valve package", QStr("31.1"), "VP-77-X", mount = "wall",
      spec = "ASTM D1", page = 1),
    item(null, QInt(9), "ZZ-1", page = 0),
    item("Cooling Tower", QInt(1), page = 5))

  test("greedy merge matches reference output exactly") {
    val merged = LlmMerge.mergeRegexAndLlmItems(regexItems, llmItems)
    assert(merged.length == 3)

    // regex[0] consumed llm[1] (fixture containment +5, page +3):
    // equal-length fixture → tie goes to enhancement; "31.1" beats 3 on
    // str-length; lineage preserved
    val m0 = merged(0)
    assert(m0.fixtureType.contains("valve package"))
    assert(m0.quantity.contains(QStr("31.1")))
    assert(m0.modelNumber.contains("VP-77-X"))
    assert(m0.dimensions.isEmpty)
    assert(m0.mountingType.contains("wall"))
    assert(m0.specReference.contains("ASTM D1"))
    assert(m0.pageNumber == 1L && m0.lineNumber.contains(1L) && m0.rawText.contains("r1"))

    // regex[1] consumed llm[0] ("pump" ⊂ "circulating pump" +5, page +3)
    val m1 = merged(1)
    assert(m1.fixtureType.contains("Circulating Pump"))
    assert(m1.quantity.contains(QInt(7L)))
    assert(m1.modelNumber.contains("CP-9"))
    assert(m1.dimensions.contains("2 x 4"))
    assert(m1.pageNumber == 2L && m1.lineNumber.contains(4L))

    // residue: llm[2] dropped (no page, no fixture); llm[3] appended
    val m2 = merged(2)
    assert(m2.fixtureType.contains("Cooling Tower"))
    assert(m2.pageNumber == 5L)
  }

  test("consumption is greedy and order-dependent") {
    // two regex items both matching the same llm item: first one consumes it
    val r = Seq(item("Cooling Tower", page = 5), item("Cooling Tower", page = 5))
    val l = IndexedSeq(item("Cooling Tower", QInt(2), "CT-1", page = 5))
    val merged = LlmMerge.mergeRegexAndLlmItems(r, l)
    assert(merged.length == 2)
    assert(merged(0).modelNumber.contains("CT-1")) // first wins
    assert(merged(1).modelNumber.isEmpty)          // second left bare
  }

  test("score below 3 does not match") {
    // model containment alone (+4) matches; page-only (+3) matches;
    // nothing (<3) does not
    val r = Seq(item("Widget", page = 9))
    val l = IndexedSeq(item("Gadget", QInt(1), page = 3))
    val merged = LlmMerge.mergeRegexAndLlmItems(r, l)
    assert(merged(0).quantity.isEmpty) // no match happened
    assert(merged.length == 2)         // unmatched llm item kept (has fixture)
  }

  test("llmActuallyWorked: false when merge changed nothing") {
    val r = Seq(item("Valve", QInt(1), "V-1", page = 1))
    assert(!LlmMerge.llmActuallyWorked(r, r))
    val enriched = Seq(r.head.copy(dimensions = Some("2 x 4")))
    assert(LlmMerge.llmActuallyWorked(r, enriched))
    assert(LlmMerge.llmActuallyWorked(r, r ++ r)) // added items
  }
}
