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
}
