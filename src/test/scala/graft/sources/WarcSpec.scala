package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** WARC source contracts: exact record framing (Content-Length bytes, CRLF
  * blank-line separators), HTTP body split, multi-member gzip (the Common
  * Crawl layout), damage tolerance with magic-resync, and the Spark
  * readPages table shape.
  */
class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val work = Files.createTempDirectory("graft_warc").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rec(tpe: String, uri: Option[String], payload: Array[Byte],
                  date: String = "2026-08-18T00:00:00Z",
                  declaredLen: Option[Int] = None): Array[Byte] = {
    val h = new StringBuilder
    h.append("WARC/1.0\r\n")
    h.append(s"WARC-Type: $tpe\r\n")
    uri.foreach(u => h.append(s"WARC-Target-URI: $u\r\n"))
    h.append(s"WARC-Date: $date\r\n")
    h.append(s"Content-Length: ${declaredLen.getOrElse(payload.length)}\r\n\r\n")
    h.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def http(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html).getBytes(UTF_8)

  private def gz(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos); g.write(bytes); g.close()
    bos.toByteArray
  }

  test("plain WARC: framing, case-folded headers, HTTP body split") {
    val file = rec("warcinfo", None, "software: test\r\n".getBytes(UTF_8)) ++
      rec("response", Some("https://a.example.com/x"), http("<html>A</html>")) ++
      rec("request", Some("https://a.example.com/x"), "GET /x HTTP/1.1\r\n".getBytes(UTF_8))
    val rs = Warc.records(file).toVector
    assert(rs.map(_.recordType) == Vector("warcinfo", "response", "request"))
    val resp = rs(1)
    assert(resp.targetUri.contains("https://a.example.com/x"))
    assert(resp.date.contains("2026-08-18T00:00:00Z"))
    assert(new String(resp.httpBody, UTF_8) == "<html>A</html>")
    // a record body may itself contain the record separator — framing is
    // by Content-Length, never by scanning
    val tricky = "X\r\n\r\nWARC/1.0 fake\r\n\r\nY"
    val rs2 = Warc.records(rec("resource", None, tricky.getBytes(UTF_8))).toVector
    assert(rs2.length == 1 && new String(rs2.head.body, UTF_8) == tricky)
  }

  test("multi-member gzip (Common Crawl layout) parses identically") {
    val r1 = rec("response", Some("https://b.example.com/1"), http("<p>one</p>"))
    val r2 = rec("response", Some("https://b.example.com/2"), http("<p>two</p>"))
    val plain = Warc.records(r1 ++ r2).toVector
    val gzd = Warc.records(gz(r1) ++ gz(r2)).toVector // one member per record
    assert(gzd.map(_.targetUri) == plain.map(_.targetUri))
    assert(gzd.map(r => new String(r.httpBody, UTF_8)) ==
      plain.map(r => new String(r.httpBody, UTF_8)))
  }

  test("streamRecords: multi-member gz off a stream, bounded readahead") {
    import java.io.{ByteArrayInputStream, InputStream}
    val r1 = rec("response", Some("https://s.example.com/1"), http("<p>first</p>"))
    // a LARGE second record: if the parser slurped the file, the counter
    // below would hit the total before the first next() returns
    val big = http("<p>" + ("x" * 300_000) + "</p>")
    val r2 = rec("response", Some("https://s.example.com/2"), big)
    val plainBytes = r1 ++ r2
    // counting wrapper: how many bytes the parser actually pulled
    class Counting(in: InputStream) extends InputStream {
      var consumed = 0L
      override def read(): Int = { val b = in.read(); if (b >= 0) consumed += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) consumed += n; n
      }
    }
    val counter = new Counting(new ByteArrayInputStream(plainBytes))
    val it = Warc.streamRecords(counter) // prefetches exactly ONE record
    // bounded buffering: with one record parsed, the parser has pulled at
    // most r1 plus its 64 KB readahead — nowhere near the 300 KB second record
    assert(counter.consumed < plainBytes.length,
      s"parser slurped the stream: ${counter.consumed} of ${plainBytes.length}")
    assert(counter.consumed <= r1.length + 64 * 1024 + 16)
    val first = it.next()
    assert(first.targetUri.contains("https://s.example.com/1"))
    assert(it.next().targetUri.contains("https://s.example.com/2"))
    assert(!it.hasNext)
    // multi-member gzip through the stream == the inflate path, record by record
    val gzStream = Warc.streamRecords(new ByteArrayInputStream(gz(r1) ++ gz(r2)))
    val inflate = Warc.records(r1 ++ r2)
    gzStream.zip(inflate).foreach { case (a, b) =>
      assert(a.headers == b.headers)
      assert(a.body.sameElements(b.body))
    }
  }

  test("streamRecords: truncated body (EOF before Content-Length) is skipped") {
    import java.io.ByteArrayInputStream
    val good = rec("response", Some("https://t.example.com/ok"), http("<b>k</b>"))
    val cut = rec("response", Some("https://t.example.com/cut"), http("<b>c</b>"),
      declaredLen = Some(500)) // declares more than the stream holds
    val rs = Warc.streamRecords(new ByteArrayInputStream(good ++ cut)).toVector
    assert(rs.flatMap(_.targetUri) == Vector("https://t.example.com/ok"))
  }

  test("damaged record is skipped and parsing resyncs on the next magic") {
    val good1 = rec("response", Some("https://c.example.com/ok1"), http("<i>1</i>"))
    val bad = rec("response", Some("https://c.example.com/bad"), http("<i>x</i>"),
      declaredLen = Some(1 << 28)) // truncated: length overruns the file
    val good2 = rec("response", Some("https://c.example.com/ok2"), http("<i>2</i>"))
    val rs = Warc.records(good1 ++ bad ++ good2).toVector
    assert(rs.flatMap(_.targetUri) ==
      Vector("https://c.example.com/ok1", "https://c.example.com/ok2"))
  }

  test("readPages: input-hint table shape from a .warc file on disk") {
    val file = rec("warcinfo", None, "software: test\r\n".getBytes(UTF_8)) ++
      rec("response", Some("https://d.example.com/p"), http("<html><p>hello</p></html>")) ++
      rec("request", Some("https://d.example.com/p"), "GET /p\r\n".getBytes(UTF_8)) ++
      rec("response", Some("https://d.example.com/q"), http("<html><p>bye</p></html>"))
    val p = Paths.get(work, "test.warc")
    Files.write(p, file)
    val df = Warc.readPages(spark, p.toString)
    assert(df.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    val rows = df.orderBy("url").collect()
    assert(rows.length == 2) // responses only
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("https://d.example.com/p", "https://d.example.com/q"))
    assert(rows.forall(_.getTimestamp(1).toInstant.toString
      == "2026-08-18T00:00:00Z"))
    assert(new String(rows(0).getAs[Array[Byte]](2), UTF_8)
      == "<html><p>hello</p></html>")
    assert(rows.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("readWet: conversion records land as text rows, html null") {
    val file = rec("warcinfo", None, "software: wet\r\n".getBytes(UTF_8)) ++
      rec("conversion", Some("https://e.example.com/1"),
        "already extracted text\nsecond line".getBytes(UTF_8)) ++
      rec("response", Some("https://e.example.com/skip"), http("<p>raw</p>")) ++
      rec("conversion", Some("https://e.example.com/2"), "more text".getBytes(UTF_8))
    val p = Paths.get(work, "test.warc.wet.gz")
    Files.write(p, gz(file))
    val rows = Warc.readWet(spark, p.toString).orderBy("url").collect()
    assert(rows.length == 2) // conversion records only
    assert(rows(0).getString(0) == "https://e.example.com/1")
    assert(rows(0).isNullAt(2)) // html null
    assert(rows(0).getString(3) == "already extracted text\nsecond line")
    assert(Warc.readWet(spark, p.toString).columns.toSeq ==
      Seq("url", "warc_ts", "html", "text", "lang"))
  }

  test("readWat: metadata-record link envelopes explode into (url, href) rows") {
    val wat1 =
      """{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":{
        |"HTML-Metadata":{"Links":[{"url":"https://t1.example.com/a","text":"x"},
        |{"url":"/rel/b"}]}}}},"Container":{"ignored":true}}""".stripMargin.replace("\n", "")
    val wat2 = """{"Envelope":{"Payload-Metadata":{}}}""" // no links: zero rows
    val file = rec("metadata", Some("https://f.example.com/p"), wat1.getBytes(UTF_8)) ++
      rec("metadata", Some("https://f.example.com/q"), wat2.getBytes(UTF_8)) ++
      rec("response", Some("https://f.example.com/skip"), http("<p>r</p>"))
    val p = Paths.get(work, "test.warc.wat.gz")
    Files.write(p, gz(file))
    val rows = Warc.readWat(spark, p.toString).orderBy("href").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(rows.toSeq == Seq(
      "https://f.example.com/p" -> "/rel/b",
      "https://f.example.com/p" -> "https://t1.example.com/a"))
    // the WAT feed drops into the host-graph pipeline unchanged
    val edges = graft.ops.WebGraph.hostEdges(
      Warc.readWat(spark, p.toString), "url").orderBy("dst").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(edges.toSeq == Seq(
      ("f.example.com", "f.example.com", 1L), // relative link -> source host
      ("f.example.com", "t1.example.com", 1L)))
  }

  test("WET/WAT writers round-trip through their readers (the CC triad, both directions)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("warcspec_wetwat").toString
    // WET: conversion records, UTF-8 text incl. multi-byte
    val texts = Seq(("https://a.ex/1", "plain text"),
      ("https://b.ex/2", "caffé — ünïcode"), ("https://a.ex/3", ""))
      .toDF("url", "text")
    graft.sources.Warc.writeConversions(texts, s"$tmp/wet", files = 2)
    val wet = graft.sources.Warc.readWet(s, s"$tmp/wet")
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(wet == Map("https://a.ex/1" -> "plain text",
      "https://b.ex/2" -> "caffé — ünïcode", "https://a.ex/3" -> ""))
    // WAT: metadata records; envelope built exactly as a producer would
    val links = Seq(("https://a.ex/1", Seq("https://x.ex/", "/rel/p")),
      ("https://b.ex/2", Seq("https://y.ex/q")))
      .toDF("url", "hrefs")
    val wat0 = links.select(col("url"),
      to_json(struct(struct(struct(struct(struct(
        transform(col("hrefs"), u => struct(u.as("url"))).as("Links"))
        .as("HTML-Metadata")).as("HTTP-Response-Metadata"))
        .as("Payload-Metadata")).as("Envelope"))).as("wat_json"))
    graft.sources.Warc.writeMetadata(wat0, s"$tmp/wat", files = 1)
    val wat = graft.sources.Warc.readWat(s, s"$tmp/wat")
      .select("url", "href").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(wat == Set(("https://a.ex/1", "https://x.ex/"),
      ("https://a.ex/1", "/rel/p"), ("https://b.ex/2", "https://y.ex/q")))
  }

  test("end to end: WARC container in, byte-identical golden extraction out") {
    import graft.fixtures.{CorpusIO, PayloadGen}
    import graft.pipeline.Extract
    // real golden corpus docs whose payload is an HTTP-deliverable byte
    // stream (html/pdf), wrapped as WARC response records
    val docs = CorpusIO.load()
      .filter(d => d.mode == "standard" && (d.payload == "html" || d.payload == "pdf"))
      .take(6)
    assert(docs.nonEmpty)
    val warc = docs.flatMap { d =>
      val (url, _, html, _, _) = PayloadGen.row(d)
      // a real response record: HTTP header block + raw payload bytes
      val body = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        .getBytes(UTF_8) ++ html
      rec("response", Some(url), body)
    }.toArray
    val wPath = Paths.get(work, "cc.warc.gz")
    Files.write(wPath, gz(warc))
    val pagesPath = s"$work/warc_pages"
    val n = Warc.writeBucketedPages(spark, wPath.toString, pagesPath, buckets = 2)
    assert(n == docs.length.toLong)
    val outRoot = s"$work/warc_out"
    Extract.run(spark, pagesPath, outRoot,
      Extract.Config(mode = "standard", buckets = 2, parallelism = 2,
        ocrEngine = "fake"))
    val got = Extract.readSnapshot(spark, outRoot)
      .select("url", "extracted_json", "error").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got.size == docs.length)
    val goldenDir = Seq("src/test/resources/golden", "/root/repo/src/test/resources/golden")
      .find(p => Files.exists(Paths.get(p))).get
    docs.foreach { d =>
      val (json, err) = got(d.url)
      assert(err == null, s"${d.url}: $err")
      val expect = new String(Files.readAllBytes(
        Paths.get(goldenDir, CorpusIO.docId(d.url) + ".json")), UTF_8)
      assert(json == expect, s"${d.url} [${d.payload}] WARC-ingested output != golden")
    }
  }

  test("fuzz: single-byte corruption of a plain WARC never throws, loses at most one record") {
    val n = 8
    val recs = (0 until n).map(i =>
      rec("response", Some(s"https://f.example/$i"), http(s"<html>doc $i</html>")))
    val file = recs.reduce(_ ++ _)
    val rnd = new scala.util.Random(4242)
    (1 to 80).foreach { trial =>
      val mutated = file.clone()
      val pos = rnd.nextInt(mutated.length)
      mutated(pos) = (mutated(pos) ^ (1 + rnd.nextInt(255))).toByte
      val got = Warc.records(mutated).toVector // must terminate, not throw
      // a flip costs at most its own record, plus one successor when it
      // lands on a Content-Length digit and ENLARGES the declared span
      // (the read then swallows the next record's magic)
      assert(got.size >= n - 2,
        s"trial $trial: flip at $pos lost ${n - got.size} records")
      got.foreach(r => assert(r.headers.nonEmpty))
    }
    // random garbage prepended/appended must not confuse framing
    val garbage = Array.fill(257)(rnd.nextInt(256).toByte)
    val framed = garbage ++ file ++ garbage
    assert(Warc.records(framed).size == n)
  }

  test("fuzz: corrupt gzip member salvages the prefix instead of killing the task") {
    val n = 6
    val members = (0 until n).map(i =>
      gz(rec("response", Some(s"https://g.example/$i"), http(s"<html>m $i</html>"))))
    val offsets = members.scanLeft(0)(_ + _.length) // member k spans [offsets(k), offsets(k+1))
    val file = members.reduce(_ ++ _)
    val rnd = new scala.util.Random(77)
    (1 to 40).foreach { trial =>
      val k = rnd.nextInt(n)
      // flip inside member k's DEFLATE payload (past the 10-byte gz header,
      // before the 8-byte trailer) so the decompressor itself fails
      val span = offsets(k + 1) - offsets(k)
      val pos = offsets(k) + 10 + rnd.nextInt(math.max(1, span - 18))
      val mutated = file.clone()
      mutated(pos) = (mutated(pos) ^ 0x55).toByte
      val got = Warc.records(mutated).toVector // prefix salvage, no throw
      assert(got.size >= k,
        s"trial $trial: corruption in member $k must keep the $k records before it, got ${got.size}")
      got.take(k).zipWithIndex.foreach { case (r, i) =>
        assert(r.targetUri.contains(s"https://g.example/$i"))
      }
    }
  }

  test("writeResponses roundtrip: distributed writer → streaming reader, byte-identical payloads") {
    val s = spark
    import s.implicits._
    val in = (0 until 37).map { i =>
      val bytes = (s"<html><body>doc $i " + ("x" * (i * 7)) + "</body></html>").getBytes(UTF_8)
      (s"https://w.example/$i", bytes)
    }
    val df = in.toDF("url", "payload")
    val outDir = s"$work/writer_out"
    Warc.writeResponses(df, outDir, files = 3)
    // one .warc.gz per non-empty partition, no temp litter
    val written = new java.io.File(outDir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // dot-prefixed crc sidecars are hidden to Spark sources
    assert(written.forall(_.endsWith(".warc.gz")), written.mkString(","))
    val back = Warc.readPages(spark, outDir)
      .select("url", "html").as[(String, Array[Byte])].collect()
      .map { case (u, b) => u -> b.toSeq }.toMap
    assert(back.size == in.size)
    in.foreach { case (u, b) =>
      assert(back(u) == b.toSeq, s"$u payload not byte-identical through the container")
    }
    // warc_ts parses to the fixed writer date
    val ts = Warc.readPages(spark, outDir).select("warc_ts").distinct().collect()
    assert(ts.length == 1 && ts(0).getTimestamp(0).toInstant.toString == "2026-01-01T00:00:00Z")
  }
}
