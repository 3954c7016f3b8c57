package graft.fixtures

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core.PageData

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** One logical document of the deterministic corpus
  * (src/test/resources/corpus/corpus.json, written by scripts/gen_corpus.py).
  */
final case class CorpusDoc(
    url: String,
    mode: String,    // construction | standard
    payload: String, // text | html | pdf
    lang: Option[String],
    warcTs: Long,    // epoch seconds
    pages: Vector[PageData],
    ocr: Boolean = false // scanned doc: payload carries a stub text layer + %%OCR sidecar
)

object CorpusIO {
  private val mapper = new ObjectMapper()

  def defaultPath: String = {
    val candidates = Seq(
      "src/test/resources/corpus/corpus.json",
      "/root/repo/src/test/resources/corpus/corpus.json"
    )
    candidates.find(p => Files.exists(Paths.get(p))).getOrElse(candidates.head)
  }

  def load(path: String = defaultPath): Vector[CorpusDoc] = {
    val root = mapper.readTree(Files.readAllBytes(Paths.get(path)))
    root.get("docs").elements().asScala.map(parseDoc).toVector
  }

  private def parseDoc(n: JsonNode): CorpusDoc = {
    val pages = n.get("pages").elements().asScala.map { p =>
      val tables = p.get("tables").elements().asScala.map { t =>
        t.elements().asScala.map { row =>
          row.elements().asScala.map { cell =>
            if (cell.isNull) None else Some(cell.asText())
          }.toVector: Seq[Option[String]]
        }.toVector: Seq[Seq[Option[String]]]
      }.toVector
      PageData(
        pageNum = p.get("page_num").asLong(),
        text = p.get("text").asText(),
        width = if (p.get("width").isNull) None else Some(p.get("width").asDouble()),
        height = if (p.get("height").isNull) None else Some(p.get("height").asDouble()),
        tables = tables
      )
    }.toVector
    CorpusDoc(
      url = n.get("url").asText(),
      mode = n.get("mode").asText(),
      payload = n.get("payload").asText(),
      lang = if (n.get("lang").isNull) None else Some(n.get("lang").asText()),
      warcTs = n.get("warc_ts").asLong(),
      pages = pages,
      ocr = Option(n.get("ocr")).exists(_.asBoolean())
    )
  }

  /** sha1(url)[:16] — golden file id, mirrors scripts/gen_goldens.py. */
  def docId(url: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
  }
}
