package graft.pipeline

import graft.fixtures.PagesGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry: synthesize the pages table (unless it exists), run
  * the extraction pipeline for both modes, print metrics.
  *
  * Usage: runMain graft.pipeline.Main <workDir> [replicate] [buckets] [cores]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val workDir = if (args.nonEmpty) args(0) else "/tmp/graft_pipeline"
    val replicate = if (args.length > 1) args(1).toInt else 1
    val buckets = if (args.length > 2) args(2).toInt else 8
    val cores = if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pagesPath = s"$workDir/pages"
    val nRows =
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(pagesPath)))
        PagesGen.write(spark, pagesPath, replicate, buckets)
      else spark.read.parquet(pagesPath).count()
    println(s"pages table: $nRows rows at $pagesPath")

    Seq("construction", "standard").foreach { mode =>
      val outRoot = s"$workDir/out_$mode"
      val t0 = System.nanoTime()
      val res = Extract.run(spark, pagesPath, outRoot,
        Extract.Config(mode = mode, buckets = buckets, parallelism = cores.toInt,
          // the synthesized corpus carries scanned docs; the fake engine
          // exercises the full OCR recovery path (swap for a real binding)
          ocrEngine = "fake"))
      val secs = (System.nanoTime() - t0) / 1e9
      val docs = res.metrics.map(_.docs).sum
      println(f"[$mode] snapshot v${res.manifestVersion} docs=$docs in $secs%.2fs (${docs / secs}%.1f docs/s)")
      val out = Extract.readSnapshot(spark, outRoot)
      out.groupBy("payload_kind").agg(count(lit(1)).as("docs"),
        sum("bytes_in").as("bytes_in"),
        sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("errors"))
        .orderBy("payload_kind").show(false)
    }
    spark.stop()
  }
}
