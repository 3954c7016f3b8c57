package graft.tools

import graft.core.{Assemble, PageData}
import graft.fixtures.CorpusIO

/** Tiny CLI surface over the extraction core (no Spark): extract one
  * document and print its canonical JSON.
  *
  * Usage:
  *   runMain graft.tools.ExtractCli corpus <url>          — corpus doc by url
  *   runMain graft.tools.ExtractCli file <mode> <path>    — one-page doc from a text file
  *   runMain graft.tools.ExtractCli file <mode> <path> -o — …written to <stem>_extracted.json
  *   runMain graft.tools.ExtractCli stdin <mode>          — one-page doc from stdin
  */
object ExtractCli {

  /** F16 — generate_output_filename (reference main.py:27-39):
    * `document.pdf` → `document_extracted.json`, in the same directory.
    */
  def outputFilename(inputPath: String): String = {
    val p = java.nio.file.Paths.get(inputPath)
    val name = p.getFileName.toString
    val dot = name.lastIndexOf('.')
    val stem = if (dot > 0) name.substring(0, dot) else name
    val out = stem + "_extracted.json"
    Option(p.getParent).map(_.resolve(out).toString).getOrElse(out)
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "corpus" :: url :: Nil =>
      val docs = CorpusIO.load()
      docs.find(_.url == url) match {
        case Some(d) => print(Assemble.renderDocument(d.pages, d.mode))
        case None =>
          System.err.println(s"url not found; first urls: ${docs.take(3).map(_.url).mkString(", ")}")
          sys.exit(1)
      }
    case "file" :: mode :: path :: rest if rest == Nil || rest == List("-o") =>
      val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      val json = Assemble.renderDocument(Seq(PageData(1, text, None, None, Nil)), mode)
      if (rest.isEmpty) print(json)
      else {
        // file sink ≙ save_json (helpers.py:9-21): mkdir parents, UTF-8
        val out = java.nio.file.Paths.get(outputFilename(path))
        Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"wrote $out")
      }
    case "stdin" :: mode :: Nil =>
      val text = new String(System.in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      print(Assemble.renderDocument(Seq(PageData(1, text, None, None, Nil)), mode))
    case _ =>
      System.err.println("usage: ExtractCli corpus <url> | file <mode> <path> | stdin <mode>")
      sys.exit(2)
  }
}
