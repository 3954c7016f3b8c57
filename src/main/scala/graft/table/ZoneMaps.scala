package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone maps — per-file min/max statistics as a table-level sidecar, the
  * data-skipping half that makes [[graft.ops.ZOrder]] pay off (Iceberg
  * manifests / Snowflake "zone maps" / ORC stripe stats, applied at FILE
  * granularity): a range predicate on any stat column prunes whole files
  * BEFORE Spark plans the scan, so the driver never even lists the
  * non-matching splits. Parquet row-group stats already prune WITHIN a
  * file at executor time; the zone map prunes the file list at the
  * planner, which at 100 TB is the difference between scheduling 10^6
  * tasks that each read a footer and scheduling only the z-range that
  * can match.
  *
  * Stats are collected in ONE pass over the written data (a groupBy on
  * `input_file_name()` with min/max partials — map-side combinable,
  * constant-size result) and committed as `_zonemap.json` via the same
  * tmp + atomic-rename discipline as [[SnapshotTable]]. Pruning is SOUND
  * regardless of layout: a file is kept unless its [min, max] provably
  * misses the predicate range (files with all-null stats are always
  * kept). Z-ordering is what makes the ranges TIGHT — on a z-ordered
  * table every interleaved column prunes; on a random layout the same
  * read degrades to a full scan but stays correct (ZoneMapSpec pins
  * both, plus exact parity with the unpruned filter).
  */
object ZoneMaps {

  final case class FileStats(file: String, stats: Map[String, (Option[Long], Option[Long])])

  private val SidecarName = "_zonemap.json"

  /** One-pass per-file min/max collection over long-typed stat columns,
    * committed atomically as `<path>/_zonemap.json`. File names are
    * stored relative to `path` so the table directory can move.
    */
  def write(spark: SparkSession, path: String, statCols: Seq[String]): Seq[FileStats] = {
    require(statCols.nonEmpty, "at least one stat column")
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val rows = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val entries = rows.map { r =>
      val full = r.getString(0)
      val rel = full.substring(full.lastIndexOf('/') + 1)
      FileStats(rel, statCols.map { c =>
        def opt(name: String): Option[Long] = {
          val i = r.fieldIndex(name)
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        }
        c -> ((opt(s"min_$c"), opt(s"max_$c")))
      }.toMap)
    }.sortBy(_.file).toSeq
    commitSidecar(path, statCols, entries)
    entries
  }

  private def commitSidecar(path: String, statCols: Seq[String],
      entries: Seq[FileStats]): Unit = {
    import graft.json.{Canonical, J}
    val body = Canonical.render(J.obj(
      "stat_cols" -> J.arr(statCols.map(J.S.apply)),
      "files" -> J.arr(entries.map { e =>
        J.obj(("file" -> J.S(e.file)) +: statCols.flatMap { c =>
          val (lo, hi) = e.stats(c)
          Seq(s"min_$c" -> lo.fold[J](J.Null)(J.I.apply),
              s"max_$c" -> hi.fold[J](J.Null)(J.I.apply))
        }: _*)
      })))
    val dir = Paths.get(stripScheme(path))
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$SidecarName.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(SidecarName), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readSidecar(path: String): Seq[FileStats] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(Paths.get(stripScheme(path)).resolve(SidecarName)))
    val cols = node.get("stat_cols").elements().asScala.map(_.asText()).toSeq
    node.get("files").elements().asScala.map { f =>
      FileStats(f.get("file").asText(), cols.map { c =>
        def opt(name: String): Option[Long] = {
          val v = f.get(name)
          if (v == null || v.isNull) None else Some(v.asLong())
        }
        c -> ((opt(s"min_$c"), opt(s"max_$c")))
      }.toMap)
    }.toSeq
  }

  /** The files that can possibly satisfy every `col -> [lo, hi]` range —
    * a file survives unless some stat column's [min, max] provably misses
    * its range; missing/null stats keep the file (prune only on proof).
    */
  def prunedFiles(path: String, ranges: Map[String, (Long, Long)]): Seq[String] =
    readSidecar(path).filter { e =>
      ranges.forall { case (c, (lo, hi)) =>
        e.stats.get(c) match {
          case Some((Some(mn), Some(mx))) => mx >= lo && mn <= hi
          case _ => true // no stats for this column/file: cannot prune
        }
      }
    }.map(_.file)

  /** Zone-map-pruned range read: plan the scan over only the surviving
    * files, then apply the EXACT predicate (the zone map is a superset
    * filter — files are pruned, rows still need the real BETWEEN).
    * Result is bit-equal to the unpruned filtered read (ZoneMapSpec).
    */
  def read(spark: SparkSession, path: String,
      ranges: Map[String, (Long, Long)]): DataFrame = {
    val files = prunedFiles(path, ranges)
    val base =
      if (files.isEmpty) spark.read.parquet(path).where(lit(false))
      else spark.read.parquet(files.map(f => s"$path/$f"): _*)
    ranges.foldLeft(base) { case (df, (c, (lo, hi))) =>
      df.where(col(c).between(lo, hi))
    }
  }

  private def stripScheme(path: String): String =
    if (path.startsWith("file:")) path.stripPrefix("file:") else path
}
