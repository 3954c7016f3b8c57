package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Distribution shape: one WARC file = one task (`binaryFile` source) —
  * exactly the Common Crawl unit of parallelism (~1 GB gz files); the
  * record iterator is lazy over the byte array. Honest memory note: gz
  * input is decompressed whole into the task (a CC file inflates ~4×);
  * that bounds executor sizing at ~5 GB/task. The streaming upgrade —
  * parse records directly off a GZIPInputStream member by member — slots
  * behind this same record-iterator interface when that bound bites.
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

  /** Transparent multi-member gunzip; non-gzip input passes through. */
  def maybeGunzip(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b)
      bytes
    else {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    }

  /** Lazy record iterator. Header names are case-folded; a record whose
    * version line, header block, or Content-Length is broken is skipped by
    * scanning forward to the next `WARC/1.0` magic.
    */
  def records(raw: Array[Byte]): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private val bytes = maybeGunzip(raw)
    private val Magic = "WARC/".getBytes(StandardCharsets.US_ASCII)
    private var pos = 0
    private var nextRec: WarcRecord = _
    advance()

    private def startsWith(at: Int, pat: Array[Byte]): Boolean = {
      if (at + pat.length > bytes.length) return false
      var i = 0
      while (i < pat.length) { if (bytes(at + i) != pat(i)) return false; i += 1 }
      true
    }

    private def nextMagic(from: Int): Int = {
      var i = math.max(from, 0)
      while (i < bytes.length && !startsWith(i, Magic)) i += 1
      if (i >= bytes.length) -1 else i
    }

    private def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) -1 else i
    }

    private def parseAt(start: Int): Option[(WarcRecord, Int)] = {
      // version line
      val vEnd = lineEnd(start)
      if (vEnd < 0) return None
      var i = vEnd + 2
      val headers = Map.newBuilder[String, String]
      var done = false
      while (!done) {
        val e = lineEnd(i)
        if (e < 0) return None
        if (e == i) { i += 2; done = true } // blank line
        else {
          val line = new String(bytes, i, e - i, StandardCharsets.UTF_8)
          val c = line.indexOf(':')
          if (c > 0)
            headers += (line.substring(0, c).trim.toLowerCase ->
              line.substring(c + 1).trim)
          i = e + 2
        }
      }
      val hs = headers.result()
      val len = hs.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0 || i + len > bytes.length) return None
      val body = java.util.Arrays.copyOfRange(bytes, i, (i + len).toInt)
      Some((WarcRecord(hs, body), (i + len).toInt))
    }

    private def advance(): Unit = {
      nextRec = null
      var at = nextMagic(pos)
      while (at >= 0 && nextRec == null) {
        parseAt(at) match {
          case Some((rec, end)) => nextRec = rec; pos = end
          case None => at = nextMagic(at + 1); pos = at // damaged: resync
        }
      }
      if (at < 0) pos = bytes.length
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; advance(); r
    }
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
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { fileBytes =>
        records(fileBytes)
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
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { fileBytes =>
        records(fileBytes)
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

  def readPages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { fileBytes =>
        records(fileBytes)
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
