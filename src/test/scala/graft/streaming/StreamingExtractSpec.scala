package graft.streaming

import graft.fixtures.{CorpusIO, PagesGen, PayloadGen}
import graft.pipeline.Extract

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest must produce byte-identical extraction to the batch
  * pipeline, resume from its checkpoint, and bound windowed state with the
  * watermark.
  */
class StreamingExtractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    work = java.nio.file.Files.createTempDirectory("streaming_spec").toString
    PagesGen.write(spark, s"$work/pages", replicate = 1, buckets = 2)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streamed extraction equals batch parseRow output per url (OCR seam active)") {
    val q = StreamingExtract.run(spark, s"$work/pages", s"$work/out",
      Extract.Config(mode = "construction", parallelism = 4, ocrEngine = "fake"))
    q.awaitTermination(120000)
    val got = spark.read.parquet(s"$work/out/data")
      .select("url", "extracted_json").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val docs = CorpusIO.load()
    assert(got.size == docs.length)
    docs.foreach { d =>
      val (_, _, html, text, _) = PayloadGen.row(d)
      val want = Extract.parseRow(d.url, html, text, 0, "construction",
        ocr = Some(graft.pipeline.FakeOcrEngine))
      assert(got(d.url) == want.extracted_json, d.url)
    }
  }

  test("restart with the same checkpoint does not reprocess (exactly-once per file)") {
    // first run consumed everything; an identical restart must add 0 rows
    val before = spark.read.parquet(s"$work/out/data").count()
    val q = StreamingExtract.run(spark, s"$work/pages", s"$work/out",
      Extract.Config(mode = "construction", parallelism = 4))
    q.awaitTermination(120000)
    val after = spark.read.parquet(s"$work/out/data").count()
    assert(after == before)
  }

  test("firstSeenDedup: custom state emits each url once, earliest event wins in-batch") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Array[Byte], String, String)]
    val pages = mem.toDF().toDF("url", "warc_ts", "html", "text", "lang")
    val dedup = StreamingExtract.firstSeenDedup(spark, pages, watermark = "1 hour")
    val q = dedup.writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // batch 1: u2 delivered twice (out of order) — earliest must win
    mem.addData(("u1", ts(10, 30), null, "a", "en"),
      ("u2", ts(10, 40), null, "b", "en"),
      ("u2", ts(10, 35), null, "b", "en"))
    q.processAllAvailable()
    // batch 2: u1 re-crawled (suppressed), u3 new
    mem.addData(("u1", ts(11, 0), null, "a", "en"),
      ("u3", ts(11, 5), null, "c", "fr"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT url, warc_ts FROM first_seen")
      .collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    assert(rows.size == 3)
    assert(rows("u1") == ts(10, 30)) // re-crawl suppressed
    assert(rows("u2") == ts(10, 35)) // in-batch earliest
    assert(rows("u3") == ts(11, 5))
    q.stop()
  }

  test("windowed metrics aggregate by event-time window with a watermark") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Array[Byte], String, String)]
    val pages = mem.toDF().toDF("url", "warc_ts", "html", "text", "lang")
    val agg = StreamingExtract.windowedMetrics(pages, "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("win_metrics")
      .outputMode("update").start()
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    mem.addData(
      ("u1", ts(10), null, "hello world", "en"),
      ("u2", ts(10), null, "spark rules", "en"),
      ("u3", ts(11), null, "bonjour", "fr"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT lang, n_pages, bytes_in FROM win_metrics")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.contains(("en", 2L, ("hello world".length + "spark rules".length).toLong)))
    assert(rows.contains(("fr", 1L, "bonjour".length.toLong)))
    q.stop()
  }

  test("curation gates are streaming-safe: per-row verdicts equal batch on the same rows") {
    // the scan-side curation operators (sanitize, blocklist, Gopher gate,
    // lang id) are stateless projections, so they must run unchanged on a
    // stream — the property that lets the same curation code serve both
    // the batch corpus build and a live ingest path
    val s = spark
    import s.implicits._
    import graft.ops.{CorpusSignals, TextStats}
    import org.apache.spark.sql.DataFrame
    val rows = (0L until 40L).map { i =>
      val body =
        if (i % 5 == 0) ("junk " * 60).trim // blocklisted + repetitive
        else s"document $i carries the usual well formed words " * 8
      (i, "x\u200b" + body) // planted zero-width for the sanitizer
    }.toVector
    def gates(df: DataFrame): Map[Long, (String, Long, Boolean, Boolean)] = {
      val cleaned = df.toDF("id", "text")
        .select(col("id"), CorpusSignals.stripInvisible(col("text")).as("clean"))
        .select(col("id"), col("clean"),
          CorpusSignals.blocklistGate(col("clean"), Seq("junk")).as("g"),
          TextStats.langId(col("clean")).as("lang"))
      val gated = graft.ops.CorpusSignals.gopherGate(cleaned, "id", "clean")
        .select(col("id"), col("keep").as("gopher_pass"))
      cleaned.join(gated, Seq("id"))
        .collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[String]("lang"),
            r.getAs[org.apache.spark.sql.Row]("g").getAs[Long]("n_bad"),
            r.getAs[org.apache.spark.sql.Row]("g").getAs[Boolean]("keep"),
            r.getAs[Boolean]("gopher_pass"))))
        .toMap
    }
    val want = gates(rows.toDF("id", "text"))
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val streamed = mem.toDF().toDF("id", "text")
      .select(col("id"), CorpusSignals.stripInvisible(col("text")).as("clean"))
      .select(col("id"), col("clean"),
        CorpusSignals.blocklistGate(col("clean"), Seq("junk")).as("g"),
        TextStats.langId(col("clean")).as("lang"))
    val q = streamed.writeStream.format("memory").queryName("cur_gates")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cur_gates").collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[String]("lang"),
            r.getAs[org.apache.spark.sql.Row]("g").getAs[Long]("n_bad"),
            r.getAs[org.apache.spark.sql.Row]("g").getAs[Boolean]("keep"))))
        .toMap
      assert(got.size == rows.size)
      rows.foreach { case (id, _) =>
        val (lang, nBad, keep, _) = want(id)
        assert(got(id) == ((lang, nBad, keep)), s"row $id diverges from batch")
      }
      // and the gates actually discriminate
      assert(want.values.exists(!_._3) && want.values.exists(_._3))
    } finally q.stop()
  }

  test("hll_sketch maintains per-key registers incrementally across stream batches") {
    // the 100 TB live-ingest property: the custom TypedImperativeAggregate
    // runs as a streaming stateful aggregation, and after ANY batch split
    // the state equals the batch-mode sketch over everything seen — max
    // merge is what the state store applies between batches
    val s = spark
    import s.implicits._
    import graft.ops.CorpusSignals
    val batch1 = (0 until 300).map(i => ("a", s"tok-${i % 120}")) ++
      (0 until 100).map(i => ("b", s"b-${i % 30}"))
    val batch2 = (0 until 200).map(i => ("a", s"late-${i % 90}")) ++
      (0 until 50).map(i => ("c", s"c-$i"))
    val want = (batch1 ++ batch2).toDF("k", "v")
      .groupBy("k").agg(CorpusSignals.hllSketchAgg(col("v"), m = 32).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("k", "v")
      .groupBy("k").agg(CorpusSignals.hllSketchAgg(col("v"), m = 32).as("r"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("hll_stream").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == want, "streamed state diverges from the batch sketch")
    } finally q.stop()
  }

  test("cms_sketch and topk_agg run as streaming stateful aggregations with batch parity") {
    // same property for the sum-merge and heap-merge aggregates: after any
    // batch split the state equals the batch-mode result over everything
    // seen — counter addition and top-k-set merge are what the state store
    // applies between batches
    val s = spark
    import s.implicits._
    import graft.ops.CorpusSignals
    val batch1 = (0 until 300).map(i => ("a", i.toLong, (i * 37 % 23).toLong)) ++
      (0 until 100).map(i => ("b", (1000 + i).toLong, (i % 9).toLong))
    val batch2 = (0 until 200).map(i => ("a", (2000 + i).toLong, (i * 11 % 29).toLong))
    val all = (batch1 ++ batch2).toDF("k", "id", "score")
    def aggBoth(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("k")
      .agg(
        CorpusSignals.cmsSketchAgg(concat_ws("-", col("id"), col("score")), 3, 16).as("c"),
        CorpusSignals.topKAgg(col("id"), col("score"), 4).as("t"))
    def snap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getString(0) -> ((r.getSeq[Long](1).toSeq,
        r.getSeq[org.apache.spark.sql.Row](2).map(e => (e.getLong(0), e.getLong(1))).toSeq))
    }.toMap
    val want = snap(aggBoth(all).collect())
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = aggBoth(mem.toDF().toDF("k", "id", "score"))
      .writeStream.format("memory").queryName("cms_topk_stream")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = snap(spark.table("cms_topk_stream").collect())
      assert(got == want, "streamed state diverges from the batch aggregates")
    } finally q.stop()
  }

  test("crawl-surface ops are streaming-safe: feed parse + url gate + surt equal batch") {
    // the discovery surface is WHERE streaming matters most — feeds
    // announce new urls continuously; the parse (tokenizer flatMap), the
    // pre-fetch gate, and the SURT key are all stateless, so the same code
    // must serve the batch index build and a live frontier feed
    val s = spark
    import s.implicits._
    import graft.ops.{Cdx, Feed, UrlFilter}
    val rows = (0L until 30L).map { i =>
      val link =
        if (i % 5 == 0) s"http://h$i.example.com/casino/p$i" // gate kill
        else s"http://WWW.h$i.Example.com/A/$i?b=$i&amp;a=1"
      (i, s"<rss><channel><item><title>t$i</title><link>$link</link>" +
        s"</item><item><title>nolink</title></item></channel></rss>")
    }.toVector
    def harvest(df: org.apache.spark.sql.DataFrame) =
      UrlFilter.gate(
        Feed.parse(df.toDF("doc_id", "xml")).select(col("doc_id"),
          col("link"), Cdx.surtKey(col("link")).as("surt")),
        "link")
        .select(col("doc_id"), col("link"), col("surt"), col("u_keep"))
    val want = harvest(rows.toDF("doc_id", "xml")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getBoolean(3)))).toMap
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val q = harvest(mem.toDF()).writeStream.format("memory")
      .queryName("crawl_surface_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("crawl_surface_stream").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
          r.getBoolean(3)))).toMap
      assert(got == want, "streamed crawl surface diverges from batch")
      assert(want.size == rows.size) // link-less entries dropped both ways
      assert(want.values.exists(!_._3) && want.values.exists(_._3))
      // surt canonicalized: www stripped, case folded, params sorted
      assert(want(1L)._2 == "com,example,h1)/a/1?a=1&b=1")
    } finally q.stop()
  }
}
