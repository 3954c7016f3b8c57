package graft.pipeline

import graft.core.Assemble
import graft.json.Canonical
import graft.table.{BucketMetrics, Manifest, SnapshotTable}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One output row per url — extracted text + spans + canonical JSON +
  * lineage/metrics columns.
  */
final case class SpanRow(start: Long, end: Long, kind: String)
final case class DocRow(
    url: String,
    bucket: Int,
    payload_kind: String,
    n_pages: Int,
    extracted_text: String,
    extracted_json: String,
    spans: Seq[SpanRow],
    bytes_in: Long,
    chars_out: Long,
    needs_ocr: Boolean,
    error: String // null when clean
)

/** The Dataset pipeline (SURVEY.md §3 Spark lifecycle):
  * pruned scan of one bucket partition → payload-valid filter → salted
  * repartition by url-hash (host-skew defusal) → typed mapPartitions parse
  * core (HTML/PDF/text routed by magic bytes) → snapshot data files →
  * manifest commit. Bucket granularity gives resumability: each bucket is
  * one chained snapshot commit; a killed job resumes at the first
  * uncommitted bucket.
  */
object Extract {

  final case class Config(
      mode: String = "construction", // construction | standard
      buckets: Int = 8,
      parallelism: Int = 0,          // 0 → spark.sql.shuffle.partitions
      salt: Int = 0,
      /** test hook: throw after committing this many buckets (-1 = never) */
      poisonAfterBuckets: Int = -1
  )

  /** Pure per-row parse — the single opaque (non-Catalyst) region. */
  def parseRow(url: String, html: Array[Byte], text: String, bucket: Int, mode: String): DocRow = {
    val dec = Decode.decode(html, text)
    val json =
      if (dec.pages.isEmpty && dec.error.isDefined) null
      else Canonical.render(
        if (mode == "standard") Assemble.standardResult(dec.pages)
        else Assemble.constructionResult(dec.pages))
    DocRow(
      url = url,
      bucket = bucket,
      payload_kind = dec.kind,
      n_pages = dec.pages.length,
      extracted_text = Assemble.combinePagesText(dec.pages),
      extracted_json = json,
      spans = dec.spans.map(s => SpanRow(s.start, s.end, s.kind)),
      bytes_in = dec.bytesIn,
      chars_out = dec.charsOut,
      needs_ocr = dec.needsOcr,
      error = dec.error.orNull
    )
  }

  /** Transform one bucket's pages into DocRows. Declarative pre/post ops;
    * the parse core is a typed mapPartitions (Catalyst object op).
    */
  def extractBucket(spark: SparkSession, pages: DataFrame, cfg: Config, bucket: Int): Dataset[DocRow] = {
    import spark.implicits._
    val p = if (cfg.parallelism > 0) cfg.parallelism
            else spark.sessionState.conf.numShufflePartitions
    val valid = pages
      .where(col("html").isNotNull || col("text").isNotNull) // O1 guard
      .select(col("url"), col("html"), col("text"))
    // salted repartition by url-hash: host-skew cannot gang up on a task
    val salted = valid.repartition(p, pmod(xxhash64(col("url")) + lit(cfg.salt), lit(p)))
    salted.as[(String, Array[Byte], String)].mapPartitions { it =>
      it.map { case (url, html, text) => parseRow(url, html, text, bucket, cfg.mode) }
    }
  }

  final case class RunResult(manifestVersion: Int, snapshotId: String,
                             metrics: Vector[BucketMetrics], resumedBuckets: Vector[Int])

  /** Run the job over a bucket-partitioned pages table, committing one
    * chained snapshot per bucket. Resumes from the current manifest if one
    * exists for the same mode.
    */
  def run(spark: SparkSession, pagesRoot: String, outRoot: String, cfg: Config): RunResult = {
    val table = new SnapshotTable(outRoot)
    val prev = table.currentManifest.filter(m => m.mode == cfg.mode && m.bucketCount == cfg.buckets)
    val done = prev.map(_.completedBuckets.toSet).getOrElse(Set.empty)
    val snapshotId = prev.map(_.snapshotId).getOrElse(
      java.util.UUID.nameUUIDFromBytes(s"${cfg.mode}-${cfg.buckets}-$outRoot".getBytes).toString.take(8))

    var version = table.currentVersion.getOrElse(0)
    var parent = prev.map(_.snapshotId)
    var metrics = prev.map(_.metrics).getOrElse(Vector.empty)
    var dataDirs = prev.map(_.dataDirs).getOrElse(Vector.empty)
    var committed = prev.map(_.completedBuckets).getOrElse(Vector.empty)
    var processed = 0

    (0 until cfg.buckets).foreach { b =>
      if (!done.contains(b)) {
        if (cfg.poisonAfterBuckets >= 0 && processed >= cfg.poisonAfterBuckets)
          throw new RuntimeException(s"poison: killed before bucket $b")
        val t0 = System.nanoTime()
        // partition-pruned scan: only this bucket's files are read
        val pages = spark.read.parquet(pagesRoot).where(col("bucket") === b)
        val out = extractBucket(spark, pages, cfg, b)
        val dir = table.dataDir(snapshotId, b)
        out.write.mode("overwrite").parquet(dir.toString)
        // metrics from the written files (no recompute of the parse)
        val row = spark.read.parquet(dir.toString).agg(
          count(lit(1)), sum("bytes_in"), sum("chars_out"),
          sum(when(col("error").isNotNull, 1L).otherwise(0L))).head()
        val secs = (System.nanoTime() - t0) / 1e9
        val bm = BucketMetrics(b, row.getLong(0),
          if (row.isNullAt(1)) 0L else row.getLong(1),
          if (row.isNullAt(2)) 0L else row.getLong(2),
          if (row.isNullAt(3)) 0L else row.getLong(3), secs)
        version += 1
        metrics = metrics :+ bm
        dataDirs = dataDirs :+ s"data/snap-$snapshotId/bucket=$b"
        committed = committed :+ b
        table.commit(Manifest(version, snapshotId, parent, cfg.mode, cfg.buckets,
          committed, dataDirs, metrics))
        parent = Some(snapshotId)
        processed += 1
      }
    }
    RunResult(version, snapshotId, metrics, committed.filter(done.contains))
  }

  /** Read the current snapshot back as a DataFrame. */
  def readSnapshot(spark: SparkSession, outRoot: String): DataFrame = {
    val table = new SnapshotTable(outRoot)
    val m = table.currentManifest.getOrElse(sys.error(s"no snapshot at $outRoot"))
    val dirs = m.dataDirs.map(d => s"$outRoot/$d")
    spark.read.parquet(dirs: _*)
  }
}
