package graft.core

import graft.fixtures.{CorpusDoc, CorpusIO}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The correctness gate of the graft: every corpus document's canonical
  * JSON must be byte-identical to the golden produced by running the
  * reference's own Python code (scripts/gen_goldens.py) on the same pages.
  */
class GoldenParitySpec extends AnyFunSuite {

  private val goldenDir = {
    val c = Seq("src/test/resources/golden", "/root/repo/src/test/resources/golden")
    c.find(p => Files.exists(Paths.get(p))).getOrElse(c.head)
  }

  private lazy val docs: Vector[CorpusDoc] = CorpusIO.load()

  private def golden(url: String): String = new String(
    Files.readAllBytes(Paths.get(goldenDir, CorpusIO.docId(url) + ".json")),
    StandardCharsets.UTF_8)

  private def firstDiff(a: String, b: String): String = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    if (i == n && a.length == b.length) "identical"
    else {
      val lo = math.max(0, i - 120)
      val hiA = math.min(a.length, i + 120)
      val hiB = math.min(b.length, i + 120)
      s"first diff at char $i\n--- expected ---\n${a.substring(lo, hiA)}\n--- actual ---\n${b.substring(lo, hiB)}"
    }
  }

  test("corpus and goldens exist") {
    assert(docs.nonEmpty)
  }

  test("all documents match reference goldens byte-identically") {
    var failures = List.empty[String]
    docs.foreach { d =>
      val expected = golden(d.url)
      val actual = Assemble.renderDocument(d.pages, d.mode)
      if (expected != actual)
        failures ::= s"${d.url} [${d.mode}]\n${firstDiff(expected, actual)}"
    }
    if (failures.nonEmpty) {
      fail(s"${failures.size}/${docs.size} documents diverge.\n\n" +
        failures.take(3).mkString("\n\n======\n\n"))
    }
  }
}
