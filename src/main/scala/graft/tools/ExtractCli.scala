package graft.tools

import graft.core.{Assemble, PageData}
import graft.fixtures.CorpusIO

/** Tiny CLI surface over the extraction core (no Spark): extract one
  * document and print its canonical JSON.
  *
  * Usage:
  *   runMain graft.tools.ExtractCli corpus <url>          — corpus doc by url
  *   runMain graft.tools.ExtractCli file <mode> <path>    — one-page doc from a text file
  *   runMain graft.tools.ExtractCli stdin <mode>          — one-page doc from stdin
  */
object ExtractCli {
  def main(args: Array[String]): Unit = args.toList match {
    case "corpus" :: url :: Nil =>
      val docs = CorpusIO.load()
      docs.find(_.url == url) match {
        case Some(d) => print(Assemble.renderDocument(d.pages, d.mode))
        case None =>
          System.err.println(s"url not found; first urls: ${docs.take(3).map(_.url).mkString(", ")}")
          sys.exit(1)
      }
    case "file" :: mode :: path :: Nil =>
      val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      print(Assemble.renderDocument(Seq(PageData(1, text, None, None, Nil)), mode))
    case "stdin" :: mode :: Nil =>
      val text = new String(System.in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      print(Assemble.renderDocument(Seq(PageData(1, text, None, None, Nil)), mode))
    case _ =>
      System.err.println("usage: ExtractCli corpus <url> | file <mode> <path> | stdin <mode>")
      sys.exit(2)
  }
}
