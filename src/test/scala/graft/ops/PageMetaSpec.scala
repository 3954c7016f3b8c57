package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Head-metadata and sitemap harvest contracts: first-wins duplicates,
  * rel token lists, robots directive aliases, title whitespace/entities,
  * loc-required sitemap entries, entity-escaped locs, and the two sitemap
  * document kinds.
  */
class PageMetaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def metaRow(html: String) = {
    val s = spark; import s.implicits._
    PageMeta.extract(Seq((1L, "u", html)).toDF("doc_id", "url", "html"),
      "doc_id", "url", "html").collect()(0)
  }

  test("page meta: title entity/whitespace, first-wins, rel token list, robots none") {
    val r = metaRow(
      """<!DOCTYPE html><HTML LANG=" en-GB "><head>
        |<title>  A &amp;
        |   B </title>
        |<title>second ignored</title>
        |<META NAME='Description' CONTENT='first'>
        |<meta name="description" content="second ignored">
        |<meta name="ROBOTS" content=" None ">
        |<link rel="stylesheet alternate" href="/no">
        |<link REL="alternate CANONICAL" HREF="https://c.example.org/1">
        |<link rel="canonical" href="https://second.ignored/">
        |<meta property="OG:Title" content="og &lt;t&gt;">
        |</head><body></body></html>""".stripMargin)
    assert(r.getString(2) == "A & B")            // title
    assert(r.getString(3) == "first")            // description
    assert(r.getString(4) == "https://c.example.org/1") // canonical
    assert(r.getString(5) == "en-GB")            // lang (trimmed)
    assert(r.getString(6) == "og <t>")           // og_title
    assert(r.getBoolean(7) && r.getBoolean(8))   // none → noindex+nofollow
  }

  test("page meta: absent fields are '', robots token split, body title ignored") {
    val r = metaRow(
      """<html><head>
        |<meta name="robots" content="NoIndex , noarchive">
        |</head><body><title>body title counts (first)</title></body></html>""".stripMargin)
    assert(r.getString(2) == "body title counts (first)")
    assert(r.getString(3) == "" && r.getString(4) == "" && r.getString(5) == "")
    assert(r.getBoolean(7) && !r.getBoolean(8))
  }

  test("page meta: a tag token terminates the title run; unterminated title runs to EOF") {
    val r1 = metaRow("<html><title>cut<meta name=\"description\" content=\"d\">off</title></html>")
    assert(r1.getString(2) == "cut" && r1.getString(3) == "d")
    val r2 = metaRow("<html><title>to the end")
    assert(r2.getString(2) == "to the end")
  }

  test("sitemap: urlset fields, trim, entity decode, loc-less entry dropped") {
    val s = spark; import s.implicits._
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url><loc> https://a.example.com/?x=1&amp;y=2 </loc>
        |   <lastmod>2024-01-02</lastmod><changefreq>daily</changefreq>
        |   <priority>0.8</priority></url>
        | <url><lastmod>2024-09-09</lastmod></url>
        | <url><loc>https://a.example.com/b</loc></url>
        |</urlset>""".stripMargin
    val got = Sitemap.parse(Seq((7L, xml)).toDF("doc_id", "xml"), "doc_id", "xml")
      .orderBy("entry_no").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 0L && got(0).getString(2) == "url")
    assert(got(0).getString(3) == "https://a.example.com/?x=1&y=2")
    assert(got(0).getString(4) == "2024-01-02")
    assert(got(0).getString(5) == "daily" && got(0).getString(6) == "0.8")
    assert(got(1).getString(3) == "https://a.example.com/b")
    assert(got(1).getString(4) == "" && got(1).getString(6) == "")
  }

  test("sitemap: sitemapindex entries come out as kind=sitemap") {
    val s = spark; import s.implicits._
    val xml =
      """<sitemapindex>
        | <sitemap><loc>https://a.example.com/s1.xml</loc><lastmod>2025-02-03</lastmod></sitemap>
        | <sitemap><loc>https://a.example.com/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val got = Sitemap.parse(Seq((1L, xml)).toDF("doc_id", "xml"), "doc_id", "xml")
      .orderBy("entry_no").collect()
    assert(got.map(_.getString(2)).toSeq == Seq("sitemap", "sitemap"))
    assert(got.map(_.getString(3)).toSeq ==
      Seq("https://a.example.com/s1.xml", "https://a.example.com/s2.xml"))
    assert(got(0).getString(4) == "2025-02-03" && got(1).getString(4) == "")
  }

  test("page meta and sitemap plan as narrow scan-stage maps — no exchange") {
    val s = spark; import s.implicits._
    val pm = PageMeta.extract(Seq((1L, "u", "<html/>")).toDF("doc_id", "url", "html"),
      "doc_id", "url", "html").queryExecution.executedPlan.toString
    val sm = Sitemap.parse(Seq((1L, "<urlset/>")).toDF("doc_id", "xml"),
      "doc_id", "xml").queryExecution.executedPlan.toString
    assert(!pm.contains("Exchange"), pm)
    assert(!sm.contains("Exchange"), sm)
  }
}
