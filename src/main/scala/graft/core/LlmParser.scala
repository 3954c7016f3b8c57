package graft.core

/** The second-item-source seam of the construction strategy — the
  * reference's pluggable LLM parser behind a factory with a model-fallback
  * chain (/root/reference/extractor/parsers/llm.py:37-154, factory
  * extraction_service.py:618-651). Offline there is no API key, the factory
  * returns None and the strategy skips the merge (main.py:96-111,
  * extraction_service.py:86-120) — mirrored here by `Option[LlmParser] =
  * None` defaults throughout.
  *
  * Implementations receive the combined page text already truncated to
  * 16,000 chars (F19, extraction_service.py:282-285) and return raw
  * second-source items; J1–J3 (graft.core.LlmMerge) does the greedy merge.
  */
trait LlmParser extends Serializable {
  def parseItems(text: String): Seq[RawItem]
}

/** The factory's model-fallback chain
  * (extraction_service.py:618-651 `_create_llm_parser`): a missing
  * credential short-circuits to None; otherwise candidate constructors
  * (gpt-4o-mini → gpt-3.5-turbo in the reference's openai branch) are
  * tried in order, any failure falling through to the next; exhaustion
  * returns None SILENTLY — the strategy then runs single-source, exactly
  * like the no-key path (main.py:96-111).
  */
object LlmParserFactory {
  def create(candidates: Seq[() => LlmParser],
             credential: Option[String]): Option[LlmParser] =
    credential.filter(_.nonEmpty).flatMap { _ =>
      candidates.view
        .flatMap(c => try Some(c()) catch { case _: Exception => None })
        .headOption
    }
}

/** Deterministic offline stand-in for the LLM source: derives items from
  * the text with fixed string rules, so the merge path is reachable
  * end-to-end and byte-comparable against the reference running the SAME
  * fake source (scripts/gen_goldens.py `FakeLlm` — the two implementations
  * are the same spec, one in Python, one here through the PyStr shims).
  */
object FakeLlmParser extends LlmParser {
  private val QtyRx = java.util.regex.Pattern.compile("[0-9]+")
  private val ModelRx = java.util.regex.Pattern.compile("[A-Z]{2,}-[0-9]+")

  def parseItems(text: String): Seq[RawItem] = {
    val out = Vector.newBuilder[RawItem]
    PyStr.split(text, '\n').foreach { ln =>
      val s = PyStr.strip(ln)
      val u = PyStr.upper(s)
      if (u.contains("PACKAGE") || u.contains("PUMP") || u.contains("STATION")) {
        val qm = QtyRx.matcher(s)
        val qty: Option[Qty] = if (qm.find()) Some(QInt(qm.group().toLong)) else None
        val mm = ModelRx.matcher(s)
        val model = if (mm.find()) Some(mm.group()) else None
        out += RawItem(Some(PyStr.title(s)), qty, model, None, None, None,
          1L, None, None, None, None)
      }
    }
    // a "discovery" the regex pass cannot produce — exercises the J3
    // residue append (unmatched second-source item with a page number)
    out += RawItem(Some("Auxiliary Drain Assembly"), Some(QInt(4L)), Some("AD-77"),
      Some("2 x 2"), Some("floor mounted"), Some("ASTM F100"),
      2L, None, None, None, None)
    out.result()
  }
}
