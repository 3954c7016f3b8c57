package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/1.0 container source (ISO 28500, the Common Crawl interchange
  * format): parse raw WARC files — plain or gzip (multi-member, the way CC
  * concatenates one gzip member per record) — into the pipeline's input
  * table shape (url, warc_ts, html, text, lang).
  *
  * From scratch, like the HTML/PDF parsers: a WARC file is a sequence of
  * records, each `WARC/1.0\r\n`, header lines to a blank line, exactly
  * Content-Length payload bytes, then `\r\n\r\n`. Response records carry
  * an HTTP message whose own headers are split off at the first CRLFCRLF.
  * Malformed records are SKIPPED, not fatal — a crawl container at corpus
  * scale always has damage, and one bad record must not kill a 1 GB task.
  *
  * Distribution shape: one WARC file = one task — exactly the Common
  * Crawl unit of parallelism (~1 GB gz files). Records are parsed
  * STREAMING off the (gunzipping) InputStream by [[streamRecords]]:
  * buffering is bounded by ONE record (CC truncates payloads at ~1 MB),
  * not the inflated file, so a 1 GB gz that inflates ~4 GB costs a task
  * megabytes, not gigabytes. The `binaryFile` source supplies only the
  * file LISTING (column-pruned to `path`, so its 2 GB content cap never
  * applies); each task opens its file off the Hadoop FileSystem and
  * streams. The whole-array [[records]] entry point remains for
  * byte-array callers and delegates to the same parser.
  */
object Warc {

  final case class WarcRecord(headers: Map[String, String], body: Array[Byte]) {
    def recordType: String = headers.getOrElse("warc-type", "")
    def targetUri: Option[String] = headers.get("warc-target-uri")
    def date: Option[String] = headers.get("warc-date")
    /** HTTP response body (after the HTTP header block), for response
      * records; the whole body when no HTTP header block is present.
      */
    def httpBody: Array[Byte] = {
      val idx = indexOfCrlfCrlf(body)
      if (idx < 0) body else body.drop(idx + 4)
    }
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Sanity cap on one record's declared Content-Length. CC truncates
    * payloads at ~1 MB, so 64 MB is far above any legitimate record while
    * keeping a corrupted length field (a few flipped bytes can declare
    * gigabytes) from buffering a whole task's stream into one body — the
    * parser treats an over-cap length as damage and resyncs WITHOUT
    * consuming the declared span, so the records behind it survive.
    */
  private val MaxRecordBytes: Long = 64L << 20
  private val MaxLineBytes: Int = 32 * 1024
  private val Magic = "WARC/".getBytes(StandardCharsets.US_ASCII)

  /** Transparent gunzip on a stream; non-gzip input passes through.
    * `GZIPInputStream` reads concatenated members natively, which is
    * exactly CC's one-member-per-record layout.
    */
  private def maybeGunzipStream(in: InputStream): InputStream = {
    val pb = new PushbackInputStream(new BufferedInputStream(in, 64 * 1024), 2)
    val b1 = pb.read()
    val b2 = if (b1 < 0) -1 else pb.read()
    if (b2 >= 0) pb.unread(b2)
    if (b1 >= 0) pb.unread(b1)
    if (b1 == 0x1f && b2 == 0x8b) new GZIPInputStream(pb, 64 * 1024) else pb
  }

  /** Streaming record iterator: parses records member-by-member off the
    * (gunzipping) InputStream. Buffering is bounded by ONE record body
    * (≤ [[MaxRecordBytes]]) plus the 64 KB inflate buffer — never the
    * inflated file. Header names are case-folded; a record whose version
    * line, header block, or Content-Length is broken is skipped by
    * scanning forward to the next `WARC/` magic. The stream is closed at
    * exhaustion.
    */
  def streamRecords(in0: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private val in = maybeGunzipStream(in0)
    private var nextRec: WarcRecord = _
    advance()

    // consume bytes until the magic "WARC/" has just been read
    private def syncToMagic(): Boolean = {
      var matched = 0
      var b = in.read()
      while (b >= 0) {
        if (b == Magic(matched)) {
          matched += 1
          if (matched == Magic.length) return true
        } else matched = if (b == Magic(0)) 1 else 0
        b = in.read()
      }
      false
    }

    // one CRLF-terminated line (exclusive); None on EOF or an over-cap line
    private def readLine(): Option[String] = {
      val buf = new ByteArrayOutputStream(128)
      var prev = -1
      var b = in.read()
      while (b >= 0 && buf.size <= MaxLineBytes) {
        if (prev == '\r' && b == '\n') {
          val arr = buf.toByteArray
          return Some(new String(arr, 0, arr.length - 1, StandardCharsets.UTF_8))
        }
        buf.write(b)
        prev = b
        b = in.read()
      }
      None
    }

    // parse one record; the stream sits right AFTER the magic bytes
    private def parseOne(): Option[WarcRecord] = {
      if (readLine().isEmpty) return None // rest of the version line
      val headers = Map.newBuilder[String, String]
      var line = readLine()
      while (line.exists(_.nonEmpty)) {
        val l = line.get
        val c = l.indexOf(':')
        if (c > 0)
          headers += (l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
        line = readLine()
      }
      if (line.isEmpty) return None // EOF mid-headers
      val hs = headers.result()
      val len = hs.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0 || len > MaxRecordBytes) return None
      val body = in.readNBytes(len.toInt)
      if (body.length < len) None else Some(WarcRecord(hs, body)) // truncated: skip
    }

    private def advance(): Unit = {
      nextRec = null
      try {
        while (nextRec == null) {
          if (!syncToMagic()) { in.close(); return }
          parseOne().foreach(r => nextRec = r)
        }
      } catch {
        case _: java.io.IOException =>
          // a corrupt COMPRESSED member (CRC/deflate error) throws from the
          // gunzip stream and cannot be resynced inside the deflate data —
          // salvage every record already parsed and end the iterator
          // instead of letting the exception kill the whole task (the
          // contract: one bad record must not cost a 1 GB container)
          nextRec = null
          try in.close() catch { case _: java.io.IOException => () }
      }
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; advance(); r
    }
  }

  /** Byte-array entry point for callers that already hold the file in
    * memory; plain or (multi-member) gzip. Delegates to [[streamRecords]].
    */
  def records(raw: Array[Byte]): Iterator[WarcRecord] =
    streamRecords(new ByteArrayInputStream(raw))

  /** Open one WARC file as a record stream on an executor: the file comes
    * off the task's Hadoop FileSystem (local, HDFS, object store) and is
    * never materialized — neither compressed nor inflated.
    */
  private def streamFile(pathStr: String): Iterator[WarcRecord] = {
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    streamRecords(fs.open(p))
  }

  /** Read WARC files into the pipeline input shape
    * (url, warc_ts, html binary, text, lang): response records with a
    * target URI become rows; text/lang are left null for the extraction
    * pipeline to fill. `path` accepts globs; .warc and .warc.gz both work.
    */
  /** WET companion reader: Common Crawl's *.warc.wet.gz files are WARC
    * containers whose `conversion` records carry already-extracted plain
    * text (no HTTP block). Emits the input-table shape with `text` filled
    * and `html` null — the entry point for pipelines that trust CC's own
    * extraction and start at the curation stages instead of ours.
    */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"))
      .as[String]
      .flatMap { file =>
        streamFile(file)
          .filter(r => r.recordType == "conversion" && r.targetUri.isDefined)
          .map(r => (r.targetUri.get, r.date.orNull,
            new String(r.body, StandardCharsets.UTF_8)))
      }
      .toDF("url", "warc_date", "text")
      .select(col("url"),
        to_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_ts"),
        lit(null).cast("binary").as("html"),
        col("text"), lit(null: String).as("lang"))
  }

  /** WAT companion reader: *.warc.wat.gz containers hold `metadata`
    * records whose JSON envelope carries, among other things, the page's
    * outlinks as CC already extracted them. Emits (url, warc_ts, href)
    * one row per link — a drop-in feed for [[graft.ops.WebGraph.hostEdges]]
    * and PageRank without touching the raw HTML. The envelope is parsed
    * with `from_json` against the minimal schema (unknown fields ignored),
    * so the JSON decode runs codegen'd in the scan stage, not in the
    * record iterator.
    */
  def readWat(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val linkSchema = "STRUCT<Envelope: STRUCT<`Payload-Metadata`: STRUCT<" +
      "`HTTP-Response-Metadata`: STRUCT<`HTML-Metadata`: STRUCT<" +
      "Links: ARRAY<STRUCT<url: STRING>>>>>>>"
    spark.read.format("binaryFile").load(path)
      .select(col("path"))
      .as[String]
      .flatMap { file =>
        streamFile(file)
          .filter(r => r.recordType == "metadata" && r.targetUri.isDefined)
          .map(r => (r.targetUri.get, r.date.orNull,
            new String(r.body, StandardCharsets.UTF_8)))
      }
      .toDF("url", "warc_date", "wat_json")
      .select(col("url"),
        to_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_ts"),
        explode(coalesce(
          from_json(col("wat_json"), linkSchema, Map.empty[String, String])
            .getField("Envelope").getField("Payload-Metadata")
            .getField("HTTP-Response-Metadata").getField("HTML-Metadata")
            .getField("Links").getField("url"),
          array())).as("href"))
      .where(col("href").isNotNull)
  }

  /** WARC → extraction-pipeline input: bucket by url-hash (the pipeline's
    * resumable per-bucket unit, same derivation as the synthetic corpus)
    * and write partitioned Parquet. Returns the row count, read back from
    * the written files' footers (no second scan of the data pages).
    */
  def writeBucketedPages(spark: SparkSession, warcPath: String,
                         outPath: String, buckets: Int): Long = {
    readPages(spark, warcPath)
      .withColumn("bucket", pmod(xxhash64(col("url")), lit(buckets)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outPath)
    spark.read.parquet(outPath).count()
  }

  /** Distributed WARC writer — the inverse of [[readPages]], used to stage
    * Common-Crawl-shaped fixtures and to re-container pipeline output for
    * WARC-consuming tools. Input columns: `url` (string), `payload`
    * (binary = the HTTP response body). Each input partition becomes one
    * `part-NNNNN.warc.gz` (one file = one task, the CC layout), each record
    * its own gzip member exactly as CC concatenates them, each payload
    * wrapped in a minimal HTTP/1.1 200 header block so [[readPages]]'
    * `httpBody` recovers the payload byte-identically. Files are written
    * via the Hadoop FileSystem to a temp name and renamed on success, so a
    * retried task never leaves a torn container behind.
    */
  def writeResponses(pages: DataFrame, outDir: String, files: Int,
                     warcDate: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = pages.sparkSession
    import spark.implicits._
    val rows = pages.select(col("url").cast("string"), col("payload").cast("binary"))
      .as[(String, Array[Byte])]
      .map { case (url, payload) =>
        val body = new ByteArrayOutputStream(payload.length + 64)
        body.write("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
          .getBytes(StandardCharsets.US_ASCII))
        body.write(payload)
        (url, body.toByteArray)
      }.toDF("url", "body")
    writeWarcFiles(rows, outDir, files, "response", warcDate)
  }

  /** WET companion WRITER: `conversion` records carrying already-extracted
    * plain text (UTF-8 body, no HTTP block) — the inverse of [[readWet]],
    * so a curation stage can publish its extraction in CC's interchange
    * shape. Same one-gzip-member-per-record framing as [[writeResponses]].
    */
  def writeConversions(pages: DataFrame, outDir: String, files: Int,
                       warcDate: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = pages.sparkSession
    import spark.implicits._
    val rows = pages.select(col("url").cast("string"), col("text").cast("string"))
      .as[(String, String)]
      .map { case (url, text) => (url, text.getBytes(StandardCharsets.UTF_8)) }
      .toDF("url", "body")
    writeWarcFiles(rows, outDir, files, "conversion", warcDate)
  }

  /** WAT companion WRITER: `metadata` records whose body is the JSON
    * envelope — the inverse of [[readWat]]. Caller supplies the envelope
    * string (typically built with to_json over the Links array).
    */
  def writeMetadata(pages: DataFrame, outDir: String, files: Int,
                    warcDate: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = pages.sparkSession
    import spark.implicits._
    val rows = pages.select(col("url").cast("string"), col("wat_json").cast("string"))
      .as[(String, String)]
      .map { case (url, json) => (url, json.getBytes(StandardCharsets.UTF_8)) }
      .toDF("url", "body")
    writeWarcFiles(rows, outDir, files, "metadata", warcDate)
  }

  /** Shared WARC container writer: `rows` = (url STRING, body BINARY),
    * one gzip member per record (the CC layout [[streamRecords]] expects),
    * `files` output shards, task-attempt-safe tmp+rename commit.
    */
  private def writeWarcFiles(rows: DataFrame, outDir: String, files: Int,
                             warcType: String, warcDate: String): Unit = {
    val spark = rows.sparkSession
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fsDriver = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsDriver.delete(out, true)
    fsDriver.mkdirs(out)
    import spark.implicits._
    val date = warcDate
    val wtype = warcType
    rows.select(col("url").cast("string"), col("body").cast("binary"))
      .as[(String, Array[Byte])]
      .repartition(files)
      .foreachPartition { (it: Iterator[(String, Array[Byte])]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
          val fs = new org.apache.hadoop.fs.Path(outDir)
            .getFileSystem(new org.apache.hadoop.conf.Configuration())
          val tmp = new org.apache.hadoop.fs.Path(outDir, f".part-$pid%05d.$attempt.tmp")
          val fin = new org.apache.hadoop.fs.Path(outDir, f"part-$pid%05d.warc.gz")
          val raw = fs.create(tmp, true)
          try {
            it.foreach { case (url0, b) =>
              // a CR/LF inside a URI would terminate the header line early
              // and corrupt record framing (header injection); WARC-Target-
              // URI cannot contain whitespace, so strip rather than fail
              val url = url0.replaceAll("[\\r\\n]", "")
              val head = (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
                s"WARC-Target-URI: $url\r\nWARC-Date: $date\r\n" +
                s"Content-Length: ${b.length}\r\n\r\n")
                .getBytes(StandardCharsets.US_ASCII)
              // one gzip member per record: finish() flushes the member and
              // leaves the underlying stream open for the next one
              val gz = new java.util.zip.GZIPOutputStream(raw, 64 * 1024)
              gz.write(head); gz.write(b)
              gz.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
              gz.finish()
            }
          } finally raw.close()
          fs.delete(fin, false)
          if (!fs.rename(tmp, fin))
            throw new java.io.IOException(s"rename $tmp -> $fin failed")
        }
      }
  }

  def readPages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"))
      .as[String]
      .flatMap { file =>
        streamFile(file)
          .filter(r => r.recordType == "response" && r.targetUri.isDefined)
          .map(r => (r.targetUri.get, r.date.orNull, r.httpBody))
      }
      .toDF("url", "warc_date", "html")
      .select(col("url"),
        to_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_ts"),
        col("html"),
        lit(null: String).as("text"), lit(null: String).as("lang"))
  }
}
