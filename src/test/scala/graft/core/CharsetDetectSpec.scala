package graft.core

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The charset layer's contracts: every detection rule on crafted bytes
  * (BOMs, strict UTF-8 validity incl. overlong/surrogate rejection, meta
  * labels with WHATWG normalization, validity-outranks-declaration,
  * fallback); the hand-rolled windows-1252 table against the WHATWG
  * index; decode round-trips; the native expressions agree with the core
  * under codegen.
  */
class CharsetDetectSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def utf8(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("BOMs are decisive and stripped on decode") {
    val bomUtf8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ utf8("héllo")
    assert(CharsetDetect.detect(bomUtf8) == CharsetDetect.Detection("utf-8", "bom"))
    assert(CharsetDetect.decode(bomUtf8) == "héllo")
    val le = Array(0xFF, 0xFE).map(_.toByte) ++ "ab€".getBytes(StandardCharsets.UTF_16LE)
    assert(CharsetDetect.detect(le).charset == "utf-16le")
    assert(CharsetDetect.decode(le) == "ab€")
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ "ab€".getBytes(StandardCharsets.UTF_16BE)
    assert(CharsetDetect.detect(be).charset == "utf-16be")
    assert(CharsetDetect.decode(be) == "ab€")
  }

  test("strict UTF-8 validation: multibyte, ascii, overlong, surrogate, truncation") {
    assert(CharsetDetect.detect(utf8("snøfall 告知")) ==
      CharsetDetect.Detection("utf-8", "valid-utf8"))
    assert(CharsetDetect.detect(utf8("plain ascii")) ==
      CharsetDetect.Detection("utf-8", "ascii"))
    // overlong encoding of '/' (C0 AF) must NOT count as valid UTF-8
    assert(CharsetDetect.validateUtf8(Array(0xC0, 0xAF).map(_.toByte))._1 == false)
    // E0 80 .. overlong 3-byte
    assert(CharsetDetect.validateUtf8(Array(0xE0, 0x80, 0x80).map(_.toByte))._1 == false)
    // ED A0 80: UTF-16 surrogate range
    assert(CharsetDetect.validateUtf8(Array(0xED, 0xA0, 0x80).map(_.toByte))._1 == false)
    // F4 90: above U+10FFFF
    assert(CharsetDetect.validateUtf8(Array(0xF4, 0x90, 0x80, 0x80).map(_.toByte))._1 == false)
    // truncated multi-byte tail
    assert(CharsetDetect.validateUtf8(utf8("é").dropRight(1))._1 == false)
    // max code point U+10FFFF is fine
    assert(CharsetDetect.validateUtf8(Array(0xF4, 0x8F, 0xBF, 0xBF).map(_.toByte)) == ((true, true)))
  }

  test("meta labels: WHATWG normalization, quotes, case; validity outranks declaration") {
    def withMeta(label: String, body: Array[Byte]) =
      utf8(s"""<html><meta charset="$label"><body>""") ++ body
    val smart = Array(0x93, 0x68, 0x69, 0x94).map(_.toByte) // “hi” in cp1252
    assert(CharsetDetect.detect(withMeta("ISO-8859-1", smart)) ==
      CharsetDetect.Detection("windows-1252", "meta"))
    assert(CharsetDetect.detect(withMeta("latin1", smart)).charset == "windows-1252")
    // http-equiv spelling
    val he = utf8("<meta http-equiv=Content-Type content='text/html; charset=windows-1252'>") ++ smart
    assert(CharsetDetect.detect(he) == CharsetDetect.Detection("windows-1252", "meta"))
    // a VALID UTF-8 body mislabeled latin1 stays UTF-8 (no mojibake)
    assert(CharsetDetect.detect(withMeta("iso-8859-1", utf8("héllo"))) ==
      CharsetDetect.Detection("utf-8", "valid-utf8"))
    // unknown label falls through to the fallback
    assert(CharsetDetect.detect(utf8("<meta charset=klingon>") ++ smart) ==
      CharsetDetect.Detection("windows-1252", "fallback"))
    // no declaration at all
    assert(CharsetDetect.detect(smart) ==
      CharsetDetect.Detection("windows-1252", "fallback"))
  }

  test("windows-1252 decode matches the WHATWG index") {
    val all = (0x80 to 0x9F).map(_.toByte).toArray
    val want = "€‚ƒ„…†‡" +
      "ˆ‰Š‹ŒŽ" +
      "‘’“”•–—" +
      "˜™š›œžŸ"
    assert(CharsetDetect.cp1252(all) == want)
    // low and high ranges map to themselves
    assert(CharsetDetect.cp1252("Abc".getBytes(StandardCharsets.US_ASCII)) == "Abc")
    assert(CharsetDetect.cp1252(Array(0xE9.toByte)) == "é") // 0xE9 = é in cp1252
    // full fallback decode: smart quotes plus accent
    val s = Array(0x93, 0x41, 0x94, 0x20, 0xE9).map(_.toByte)
    assert(CharsetDetect.decode(s) == "“A” é")
  }

  test("native expressions agree with the core (codegen path) and handle nulls") {
    val s = spark; import s.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val smart = Array(0x93, 0x68, 0x69, 0x94).map(_.toByte)
    val rows = Seq(
      ("u8", utf8("héllo wörld")),
      ("ascii", utf8("plain")),
      ("cp", smart),
      ("bom", Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ utf8("x")),
      ("null", null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("k", "b")
    df.createOrReplaceTempView("wd_in")
    val got = spark.sql(
      "SELECT k, charset_of(b) AS cs, decode_web(b) AS t FROM wd_in")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    rows.foreach { case (k, b) =>
      if (b == null) assert(got(k) == ((null, null)), k)
      else assert(got(k) ==
        ((CharsetDetect.detect(b).charset, CharsetDetect.decode(b))), k)
    }
    assert(got("cp")._2 == "“hi”")
    assert(got("bom")._2 == "x")
  }
}
