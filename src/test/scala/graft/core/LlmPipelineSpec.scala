package graft.core

import graft.fixtures.{CorpusIO, PayloadGen}
import graft.pipeline.Extract
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** End-to-end parity of the J1–J3 merge path: with the SAME deterministic
  * fake second source wired into both engines (reference:
  * ConstructionExtractionStrategy(llm_parser=FakeLlm) via
  * scripts/gen_goldens.py; ours: Assemble.constructionResult(_,
  * Some(FakeLlmParser))), every construction document's output must be
  * byte-identical to the reference-run golden in golden/llm/.
  */
class LlmPipelineSpec extends AnyFunSuite {

  private val goldenDir = Seq("src/test/resources/golden/llm",
      "/root/repo/src/test/resources/golden/llm")
    .find(p => Files.exists(Paths.get(p))).getOrElse(fail("no llm golden dir"))

  private lazy val docs = CorpusIO.load().filter(_.mode == "construction")

  private def golden(url: String): String = new String(
    Files.readAllBytes(Paths.get(goldenDir, CorpusIO.docId(url) + ".json")),
    StandardCharsets.UTF_8)

  test("merge path output matches reference-run llm goldens byte-identically") {
    assert(docs.nonEmpty)
    var failures = 0
    docs.foreach { d =>
      val actual = Assemble.renderDocument(d.pages, "construction", Some(FakeLlmParser))
      val expected = golden(d.url)
      if (actual != expected) {
        failures += 1
        if (failures == 1) {
          val i = actual.zip(expected).indexWhere { case (a, b) => a != b }
          val at = if (i < 0) math.min(actual.length, expected.length) else i
          info(s"${d.url}: first diff at $at\nexp: ${expected.slice(at - 80, at + 80)}\ngot: ${actual.slice(at - 80, at + 80)}")
        }
      }
    }
    assert(failures == 0, s"$failures/${docs.length} llm-merge documents diverge")
  }

  test("merge path is reachable through the pipeline payload parse") {
    val d = docs.find(_.payload == "pdf").getOrElse(docs.head)
    val (_, _, html, text, _) = PayloadGen.row(d)
    val withLlm = Extract.parseRow(d.url, html, text, 0, "construction",
      Some(FakeLlmParser))
    val without = Extract.parseRow(d.url, html, text, 0, "construction", None)
    assert(withLlm.extracted_json == golden(d.url))
    assert(withLlm.extracted_json != without.extracted_json,
      "fake source must actually change the output")
  }

  test("merge falls back to regex-only when the source returns nothing") {
    object EmptySource extends LlmParser {
      def parseItems(text: String): Seq[RawItem] = Nil
    }
    val d = docs.head
    val a = Assemble.renderDocument(d.pages, "construction", Some(EmptySource))
    val b = Assemble.renderDocument(d.pages, "construction", None)
    assert(a == b)
  }

  test("merge swallows a throwing source (fallback-not-fail)") {
    object BoomSource extends LlmParser {
      def parseItems(text: String): Seq[RawItem] = sys.error("simulated outage")
    }
    val d = docs.head
    val a = Assemble.renderDocument(d.pages, "construction", Some(BoomSource))
    val b = Assemble.renderDocument(d.pages, "construction", None)
    assert(a == b)
  }

  test("factory fallback chain: key gates, failures fall through, exhaustion is silent") {
    // extraction_service.py:618-651 semantics
    def boom(): LlmParser = throw new RuntimeException("model unavailable")
    val chain = Seq(boom _, () => FakeLlmParser: LlmParser)
    // no credential -> None without touching any candidate
    assert(LlmParserFactory.create(Seq(() => fail("must not construct")), None).isEmpty)
    assert(LlmParserFactory.create(chain, Some("")).isEmpty) // empty key = unset env
    // first candidate fails (gpt-4o-mini analog) -> second is used
    assert(LlmParserFactory.create(chain, Some("key")).contains(FakeLlmParser))
    // every candidate fails -> silent None (single-source strategy)
    assert(LlmParserFactory.create(Seq(boom _, boom _), Some("key")).isEmpty)
  }
}
