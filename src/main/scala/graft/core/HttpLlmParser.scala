package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Real LLM binding behind the [[LlmParser]] seam: an OpenAI-style
  * chat/completions HTTP client (java.net.http, no extra dependency) that
  * mirrors the reference's OpenAIParser.parse
  * (/root/reference/extractor/parsers/llm.py:37-89): same two-message
  * prompt shape, same items JSON schema
  * (extraction_service.py:240-281), `response_format: json_object`, and
  * the response's `choices[0].message.content` parsed as an
  * `{"items": [...]}` object.
  *
  * Failure contract: ANY error — connect failure, non-200 status, malformed
  * JSON — throws, and the strategy's call site catches and falls back to
  * regex-only items (Assemble.scala, mirroring extraction_service.py:
  * 292-294's bare `except`). Selected via
  * `Extract.Config(secondSource = "http")`, configured by
  * GRAFT_LLM_ENDPOINT / GRAFT_LLM_MODEL / GRAFT_LLM_API_KEY, with the
  * reference's model-fallback chain (gpt-4o-mini → gpt-3.5-turbo) applied
  * through [[LlmParserFactory]]; offline default everywhere stays "none".
  *
  * The HttpClient is per-executor (@transient lazy) — the parser instance
  * ships in the task closure, the socket pool does not.
  */
final class HttpLlmParser(endpoint: String, model: String, apiKey: String,
                          timeoutSec: Long = 60) extends LlmParser {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()
  @transient private lazy val mapper = new ObjectMapper()

  /** The reference's items schema, transcribed from
    * extraction_service.py:240-281 (descriptions trimmed — they are prompt
    * guidance, not structure).
    */
  private def itemsSchema(f: JsonNodeFactory): JsonNode = {
    val props = f.objectNode()
    props.set[JsonNode]("fixture_type", f.objectNode().put("type", "string"))
    props.set[JsonNode]("quantity",
      f.objectNode().set[JsonNode]("type", f.arrayNode().add("integer").add("string")))
    props.set[JsonNode]("model_number", f.objectNode().put("type", "string"))
    props.set[JsonNode]("dimensions", f.objectNode().put("type", "string"))
    props.set[JsonNode]("mounting_type", f.objectNode().put("type", "string"))
    props.set[JsonNode]("spec_reference", f.objectNode().put("type", "string"))
    props.set[JsonNode]("page_number",
      f.objectNode().set[JsonNode]("type", f.arrayNode().add("integer").add("string")))
    val item = f.objectNode().put("type", "object")
    item.set[JsonNode]("properties", props)
    val items = f.objectNode().put("type", "array")
    items.set[JsonNode]("items", item)
    val root = f.objectNode().put("type", "object")
    root.set[JsonNode]("properties", f.objectNode().set[JsonNode]("items", items))
    root.set[JsonNode]("required", f.arrayNode().add("items"))
    root
  }

  /** The reference's user prompt (llm.py:49-77), schema inlined with
    * json.dumps(indent=2) semantics via Jackson's default pretty printer.
    */
  private def userPrompt(text: String): String = {
    val f = JsonNodeFactory.instance
    val schema = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(itemsSchema(f))
    s"""You are an expert at extracting structured data from construction PDF documents (plumbing submittals, mechanical plans, work packages).
       |
       |Extract ALL construction items, equipment, and fixtures with their quantities, model numbers, dimensions, mounting types, and spec/page references. Quantities may be integers or string references; keep string references as strings.
       |
       |Document Text:
       |$text
       |
       |Extract all construction items according to this schema:
       |$schema
       |
       |Return a JSON object with an "items" array containing all extracted items.""".stripMargin
  }

  private def requestBody(text: String): String = {
    val f = JsonNodeFactory.instance
    val root = f.objectNode().put("model", model)
    val msgs = f.arrayNode()
    msgs.add(f.objectNode().put("role", "system").put("content",
      "You are an expert construction document analyst specializing in extracting structured data from plumbing, mechanical, and construction PDFs."))
    msgs.add(f.objectNode().put("role", "user").put("content", userPrompt(text)))
    root.set[JsonNode]("messages", msgs)
    root.set[JsonNode]("response_format", f.objectNode().put("type", "json_object"))
    mapper.writeValueAsString(root)
  }

  private def optStr(n: JsonNode, field: String): Option[String] = {
    val v = n.get(field)
    if (v == null || v.isNull) None else Some(v.asText())
  }

  private[core] def itemsFromContent(content: String): Seq[RawItem] = {
    val root = mapper.readTree(content)
    val arr = root.get("items")
    if (arr == null || !arr.isArray) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      arr.elements().asScala.map { it =>
        val qty: Option[Qty] = it.get("quantity") match {
          case null => None
          case q if q.isNull => None
          case q if q.isIntegralNumber => Some(QInt(q.asLong()))
          case q => Some(QStr(q.asText()))
        }
        val page: Long = it.get("page_number") match {
          case null => 1L
          case p if p.isIntegralNumber => p.asLong()
          case p if p.asText().forall(_.isDigit) && p.asText().nonEmpty => p.asText().toLong
          case _ => 1L
        }
        RawItem(optStr(it, "fixture_type"), qty, optStr(it, "model_number"),
          optStr(it, "dimensions"), optStr(it, "mounting_type"),
          optStr(it, "spec_reference"), page, None, None, None, None)
      }.toVector
    }
  }

  override def parseItems(text: String): Seq[RawItem] = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofSeconds(timeoutSec))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(requestBody(text)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"llm endpoint returned ${resp.statusCode()}")
    val content = mapper.readTree(resp.body())
      .path("choices").path(0).path("message").path("content")
    if (content.isMissingNode || content.isNull)
      throw new java.io.IOException("llm response missing choices[0].message.content")
    itemsFromContent(content.asText())
  }
}

/** Env-driven construction of the HTTP parser with the reference's
  * model-fallback chain (extraction_service.py:618-651: gpt-4o-mini →
  * gpt-3.5-turbo; a missing credential short-circuits to None).
  */
object HttpLlmParser {
  def fromEnv(env: Map[String, String] = sys.env): Option[LlmParser] =
    env.get("GRAFT_LLM_ENDPOINT").filter(_.nonEmpty).flatMap { ep =>
      val models = env.get("GRAFT_LLM_MODEL").filter(_.nonEmpty)
        .map(Seq(_)).getOrElse(Seq("gpt-4o-mini", "gpt-3.5-turbo"))
      LlmParserFactory.create(
        models.map(m => () => new HttpLlmParser(ep, m,
          env.getOrElse("GRAFT_LLM_API_KEY", "")): LlmParser),
        env.get("GRAFT_LLM_API_KEY"))
    }
}
