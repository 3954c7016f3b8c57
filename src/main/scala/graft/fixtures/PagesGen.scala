package graft.fixtures

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize the `pages` table (BASELINE.json input_hint schema:
  * url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
  * from the deterministic corpus, written as Parquet partitioned by
  * `bucket = pmod(xxhash64(url), B)` so the resumable per-bucket jobs get
  * partition-pruned scans. `replicate` scales the corpus for benchmarks
  * (urls suffixed ?r=N, payloads re-encoded per-url so variants differ);
  * replicate=1 keeps the golden urls intact. Host-skew is embedded by the
  * corpus generator (host-0 owns ~30% of urls).
  */
object PagesGen {

  final case class PageRowOut(url: String, warc_ts: java.sql.Timestamp,
                              html: Array[Byte], text: String, lang: String)

  /** `fat` multiplies each page's text (bench realism: real Common-Crawl
    * pages are tens of KB, the golden corpus docs ~1 KB). fat=1 keeps the
    * golden urls byte-exact.
    */
  def docsFor(r: Int, fat: Int): Seq[PageRowOut] = {
    val docs = CorpusIO.load()
    docs.map { d1 =>
      val d0 = if (fat <= 1) d1
        else d1.copy(pages = d1.pages.map(p =>
          p.copy(text = Iterator.fill(fat)(p.text).mkString("\n"))))
      val d = if (r == 0) d0 else d0.copy(url = s"${d0.url}?r=$r", warcTs = d0.warcTs + r)
      val (url, ts, html, text, lang) = PayloadGen.row(d)
      PageRowOut(url, new java.sql.Timestamp(ts * 1000L), html, text, lang)
    }
  }

  def rows(replicate: Int): Seq[PageRowOut] =
    (0 until replicate).flatMap(r => docsFor(r, 1))

  /** Payload generation is distributed (one task per replica) — the corpus
    * synthesis itself must not be a driver-side serial bottleneck at bench
    * scale.
    */
  def write(spark: SparkSession, path: String, replicate: Int, buckets: Int,
            fat: Int = 1): Long = {
    import spark.implicits._
    val par = math.min(replicate, spark.sparkContext.defaultParallelism)
    val df = spark.range(0, replicate, 1, par)
      .as[Long].flatMap(r => docsFor(r.toInt, fat)).toDF()
      .withColumn("bucket", pmod(xxhash64(col("url")), lit(buckets)).cast("int"))
    df.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(path)
    // count from the written files (footer metadata) — df.count() would
    // re-execute the whole distributed payload synthesis a second time
    spark.read.parquet(path).count()
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
