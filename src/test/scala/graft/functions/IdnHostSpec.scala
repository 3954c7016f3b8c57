package graft.functions

import graft.ops.CorpusSignals
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** idn_host contracts: RFC 3492 §7.1 encoder vectors, cross-pin against the
  * JDK's independent IDNA implementation, pass-through rules (ASCII,
  * already-ACE, empty labels), NFC folding of decomposed input, SQL
  * registration, interpreted ≡ codegen.
  */
class IdnHostSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def host(s: String): String =
    IdnHost.compute(UTF8String.fromString(s)).toString

  test("punycode encoder matches RFC 3492 §7.1 sample vectors") {
    // (A) Arabic (Egyptian) — no basic code points, so no delimiter
    val arabic = "ليهمابتكل" +
      "موشعربي؟"
    assert(IdnHost.punycode(arabic) == "egbpdaj6bu4bxfgehfvwxn")
    // (B) Chinese (simplified)
    val hanS = "他们为什么不说中文"
    assert(IdnHost.punycode(hanS) == "ihqwcrb4cv8a8dqg056pqjye")
    // (C) Chinese (traditional)
    val hanT = "他們爲什麽不說中文"
    assert(IdnHost.punycode(hanT) == "ihqwctvzc91f659drss3x8bo0yb")
    // (I) Russian
    val ru = "почемужеон" +
      "инеговорятп" +
      "орусски"
    assert(IdnHost.punycode(ru) == "b1abfaaepdrnnbgefbadotcwatmq2g4l")
    // mixed basic + extended with delimiter
    assert(IdnHost.punycode("bücher") == "bcher-kva")
    assert(IdnHost.punycode("münchen") == "mnchen-3ya")
  }

  test("host canonicalization: lowercase, per-label ACE, pass-throughs") {
    assert(host("Bücher.Example.COM") == "xn--bcher-kva.example.com")
    assert(host("日本語.jp") == "xn--wgv71a119e.jp")
    assert(host("plain.Example.ORG") == "plain.example.org")
    assert(host("xn--bcher-kva.example") == "xn--bcher-kva.example") // already ACE
    assert(host("café.example.") == "xn--caf-dma.example.") // trailing dot kept
  }

  test("NFC folding: composed and decomposed spellings collide") {
    val composed = "café.fr"           // é U+00E9
    val decomposed = "café.fr"        // e + combining acute
    assert(host(composed) == host(decomposed))
    assert(host(decomposed) == "xn--caf-dma.fr")
  }

  test("cross-pin: agrees with the JDK's independent IDNA encoder") {
    // java.net.IDN implements IDNA2003 (nameprep); on this already-
    // lowercase, mapping-free input set both implementations must agree
    val hosts = Seq("bücher.de", "münchen.de",
      "日本語.jp", "café.example.com",
      "почта.рф", "plain.example.org")
    hosts.foreach { h =>
      assert(host(h) == java.net.IDN.toASCII(h).toLowerCase(java.util.Locale.ROOT),
        s"mismatch vs JDK on $h")
    }
  }

  test("SQL registration and codegen path") {
    val s = spark; import s.implicits._
    GraftFunctions.registerAll(s)
    val viaSql = s.sql("SELECT idn_host('Bücher.Example.COM') AS h")
      .head().getString(0)
    assert(viaSql == "xn--bcher-kva.example.com")
    // through a real plan (codegen'd projection over a DataFrame)
    val df = Seq("münchen.DE", "plain.org").toDF("h")
      .select(CorpusSignals.idnHost(col("h")).as("a"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("xn--mnchen-3ya.de", "plain.org"))
  }

  test("interpreted eval equals the codegen'd kernel; nulls stay null") {
    val in = "bücher.日本語.example"
    val interpreted = IdnHost(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(in))).eval(null)
    assert(interpreted.toString == "xn--bcher-kva.xn--wgv71a119e.example")
    val nul = IdnHost(org.apache.spark.sql.catalyst.expressions.Literal
      .create(null, org.apache.spark.sql.types.StringType)).eval(null)
    assert(nul == null)
  }
}
