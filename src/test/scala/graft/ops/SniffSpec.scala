package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Magic-byte sniffing contracts: every signature on crafted bytes, the
  * HTML prefix variants (whitespace, BOM, case), the WHATWG binary-byte
  * boundary for the text/plain fallback, and degenerate payloads.
  */
class SniffSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sniff(bytes: Array[Byte]): String = {
    val s = spark; import s.implicits._
    Seq(Tuple1(bytes)).toDF("p")
      .select(Sniff.sniffMime(col("p"))).collect()(0).getString(0)
  }
  private def sniffS(text: String): String =
    sniff(text.getBytes("UTF-8"))

  test("binary signatures route to their types") {
    assert(sniffS("%PDF-1.7 rest") === "application/pdf")
    assert(sniff(Array[Byte](0x1f, 0x8b.toByte, 8, 0)) === "application/gzip")
    assert(sniff(Array[Byte](0x50, 0x4b, 3, 4, 9, 9)) === "application/zip")
    assert(sniff(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 1)
      .map(_.toByte)) === "image/png")
    assert(sniff(Array(0xff, 0xd8, 0xff, 0xe1).map(_.toByte)) === "image/jpeg")
    assert(sniffS("GIF89a....") === "image/gif")
    assert(sniffS("GIF87a....") === "image/gif")
  }

  test("html prefixes: whitespace, BOM, case variants; tags beat text/plain") {
    assert(sniffS("<!DOCTYPE html><html>") === "text/html")
    assert(sniffS("  \n\t<!doctype HTML>") === "text/html")
    assert(sniffS("﻿<html lang=en>") === "text/html")
    assert(sniffS("<HEAD><title>t</title>") === "text/html")
    assert(sniffS("<body>x</body>") === "text/html")
    // an html tag deeper than the prefix check is NOT html
    assert(sniffS("hello <html>") === "text/plain")
  }

  test("WHATWG binary-byte boundary: 0x0C and 0x1B are text, 0x0B is not") {
    assert(sniffS("plain with tab\t cr\r lf\n") === "text/plain")
    assert(sniff(Array[Byte](97, 0x0c, 98)) === "text/plain") // form feed
    assert(sniff(Array[Byte](97, 0x1b, 98)) === "text/plain") // ESC
    assert(sniff(Array[Byte](97, 0x0b, 98)) ===
      "application/octet-stream") // vertical tab
    assert(sniff(Array[Byte](0, 1, 2, 65)) === "application/octet-stream")
  }

  test("degenerate payloads: empty is text/plain, short prefixes total") {
    assert(sniffS("") === "text/plain")
    assert(sniffS("x") === "text/plain")
    // a lone 0x1f is not gzip (no 0x8b) but IS a WHATWG binary byte
    assert(sniff(Array[Byte](0x1f)) === "application/octet-stream")
  }
}
