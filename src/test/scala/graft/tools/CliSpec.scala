package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** F16 — output-filename derivation (reference main.py:27-39). */
class CliSpec extends AnyFunSuite {

  test("outputFilename derives stem + _extracted.json") {
    assert(ExtractCli.outputFilename("document.pdf") == "document_extracted.json")
    assert(ExtractCli.outputFilename("/a/b/plans.v2.pdf") == "/a/b/plans.v2_extracted.json")
    assert(ExtractCli.outputFilename("noext") == "noext_extracted.json")
    assert(ExtractCli.outputFilename(".hidden") == ".hidden_extracted.json")
  }

  test("file sink writes the canonical JSON to the derived name") {
    val dir = java.nio.file.Files.createTempDirectory("cli_sink")
    val in = dir.resolve("sample.pdf")
    java.nio.file.Files.write(in, "QTY: 3 EA VALVE PACKAGE MODEL VP-1".getBytes("UTF-8"))
    ExtractCli.main(Array("file", "construction", in.toString, "-o"))
    val out = dir.resolve("sample_extracted.json")
    assert(java.nio.file.Files.exists(out))
    val json = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    assert(json.contains("\"extraction_mode\": \"construction_takeoff\""))
  }
}
