package graft.core

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** HttpLlmParser against a local OpenAI-shaped endpoint: request shape
  * (model, two messages, response_format, bearer auth), response unwrap
  * (choices[0].message.content → items), item field mapping incl. the
  * int-or-string quantity/page_number contract, and the throw-on-error
  * contract the strategy's catch-and-fall-back relies on.
  */
class HttpLlmParserSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var lastBody: String = _
  private var lastAuth: String = _
  @volatile private var respond: () => (Int, String) = _

  private def endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastBody = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        lastAuth = ex.getRequestHeaders.getFirst("Authorization")
        val (code, body) = respond()
        val b = body.getBytes(UTF_8)
        ex.sendResponseHeaders(code, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def ok(content: String): (Int, String) = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    val msg = m.createObjectNode().put("role", "assistant").put("content", content)
    val choice = m.createObjectNode()
    choice.set[com.fasterxml.jackson.databind.JsonNode]("message", msg)
    root.set[com.fasterxml.jackson.databind.JsonNode]("choices",
      m.createArrayNode().add(choice))
    (200, m.writeValueAsString(root))
  }

  test("request carries model, truncated text, json_object format, bearer key") {
    respond = () => ok("""{"items": []}""")
    val p = new HttpLlmParser(endpoint, "gpt-4o-mini", "sk-test")
    assert(p.parseItems("PUMP STATION P-1 text body").isEmpty)
    assert(lastAuth == "Bearer sk-test")
    assert(lastBody.contains(""""model":"gpt-4o-mini""""))
    assert(lastBody.contains("PUMP STATION P-1 text body"))
    assert(lastBody.contains(""""response_format":{"type":"json_object"}"""))
    assert(lastBody.contains(""""role":"system""""))
    assert(lastBody.contains(""""role":"user""""))
  }

  test("items map to RawItem: int and string quantities, page numbers, nulls") {
    respond = () => ok(
      """{"items": [
        |  {"fixture_type": "Valve Package", "quantity": 31, "model_number": "OM-141",
        |   "dimensions": "2 x 4", "mounting_type": "wall-mounted",
        |   "spec_reference": "ASTM F100", "page_number": 3},
        |  {"fixture_type": "Circulating Pump", "quantity": "31.1, 31", "page_number": "7"},
        |  {"fixture_type": "Eye Wash Station", "page_number": "p. 2"}
        |]}""".stripMargin)
    val got = new HttpLlmParser(endpoint, "m", "k").parseItems("t")
    assert(got.size == 3)
    assert(got(0) == RawItem(Some("Valve Package"), Some(QInt(31L)), Some("OM-141"),
      Some("2 x 4"), Some("wall-mounted"), Some("ASTM F100"), 3L, None, None, None, None))
    assert(got(1).quantity.contains(QStr("31.1, 31")))
    assert(got(1).pageNumber == 7L)
    assert(got(2).quantity.isEmpty)
    assert(got(2).pageNumber == 1L) // non-numeric page reference -> default
  }

  test("non-200 and malformed responses throw (call site falls back to regex items)") {
    val p = new HttpLlmParser(endpoint, "m", "k")
    respond = () => (500, """{"error": "overloaded"}""")
    intercept[Exception](p.parseItems("t"))
    respond = () => (200, """{"nope": true}""")
    intercept[Exception](p.parseItems("t"))
    respond = () => ok("this is not json")
    intercept[Exception](p.parseItems("t"))
    // connection refused (dead port) also throws
    val dead = new HttpLlmParser("http://127.0.0.1:1/v1/x", "m", "k", timeoutSec = 2)
    intercept[Exception](dead.parseItems("t"))
  }

  test("fromEnv: endpoint+key -> parser; missing either -> None (reference no-credential path)") {
    val env = Map("GRAFT_LLM_ENDPOINT" -> endpoint, "GRAFT_LLM_API_KEY" -> "sk-x")
    assert(HttpLlmParser.fromEnv(env).isDefined)
    assert(HttpLlmParser.fromEnv(env - "GRAFT_LLM_API_KEY").isEmpty)
    assert(HttpLlmParser.fromEnv(env - "GRAFT_LLM_ENDPOINT").isEmpty)
    assert(HttpLlmParser.fromEnv(env + ("GRAFT_LLM_API_KEY" -> "")).isEmpty)
  }
}
