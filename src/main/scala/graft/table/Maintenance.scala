package graft.table

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Iceberg-style table maintenance over [[SnapshotTable]]: small-file
  * compaction and snapshot expiry — the two jobs a checkpointed extraction
  * table needs at 100 TB, where a resumable pipeline that commits per
  * bucket (and a streaming writer that commits per micro-batch) steadily
  * accretes files far below the optimal scan size.
  *
  * Both operations follow the table's immutability contract: compaction
  * REWRITES nothing in place — it writes a new snapshot directory and
  * commits a chained manifest, so every previous manifest still reads
  * (time travel) until `expireSnapshots` reclaims unreferenced data.
  */
object Maintenance {

  final case class CompactResult(manifestVersion: Int, snapshotId: String,
                                 filesBefore: Int, filesAfter: Int)

  private def parquetFiles(dir: Path): Vector[Path] =
    if (!Files.exists(dir)) Vector.empty
    else Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toVector

  /** Compact the CURRENT snapshot: per bucket, rewrite its data files into
    * ceil(bytes / targetBytes) files (never more than it already has), as a
    * new snapshot committed with parent lineage. Row content is preserved;
    * extraction metrics carry forward unchanged — they describe the
    * lineage of the DATA, which compaction does not alter.
    *
    * Scale note: each bucket compacts as one column-complete scan +
    * coalesce (no shuffle — coalesce only narrows) + write; buckets are
    * independent, so a real deployment fans them out. File sizing uses the
    * actual on-disk bytes, not row counts, so the result hits the target
    * scan granularity whatever the rows weigh.
    */
  def compact(spark: SparkSession, outRoot: String,
              targetBytes: Long = 128L << 20): CompactResult = {
    val table = new SnapshotTable(outRoot)
    val m = table.currentManifest.getOrElse(sys.error(s"no snapshot at $outRoot"))
    val newId = java.util.UUID
      .nameUUIDFromBytes(s"${m.snapshotId}-compact-v${m.version}".getBytes)
      .toString.take(8)
    val root = Paths.get(outRoot)
    var before = 0
    var after = 0
    val newDirs = m.dataDirs.map { rel =>
      val bucket = rel.split("bucket=").last.toInt
      val src = root.resolve(rel)
      val files = parquetFiles(src)
      before += files.size
      val bytes = files.map(Files.size).sum
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
        .min(files.size.toLong).toInt
      val dst = table.dataDir(newId, bucket)
      spark.read.parquet(src.toString)
        .coalesce(nOut)
        .write.mode("overwrite").parquet(dst.toString)
      after += parquetFiles(dst).size
      s"data/snap-$newId/bucket=$bucket"
    }
    val version = m.version + 1
    table.commit(Manifest(version, newId, Some(m.snapshotId), m.mode,
      m.bucketCount, m.completedBuckets, newDirs, m.metrics))
    CompactResult(version, newId, before, after)
  }

  /** Expire snapshots: delete data directories not referenced by the last
    * `keepLast` manifests (the current one included). Manifests themselves
    * are never deleted — history stays auditable; only unreferenced DATA
    * is reclaimed. Returns the removed snapshot ids.
    */
  def expireSnapshots(outRoot: String, keepLast: Int = 1): Vector[String] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val table = new SnapshotTable(outRoot)
    val current = table.currentVersion.getOrElse(return Vector.empty)
    val keepVersions = (math.max(1, current - keepLast + 1) to current)
    val referenced = keepVersions.flatMap { v =>
      table.readManifest(v).dataDirs.map(_.split("/")(1)) // snap-<id>
    }.toSet
    val dataRoot = Paths.get(outRoot).resolve("data")
    if (!Files.exists(dataRoot)) return Vector.empty
    val removed = Files.list(dataRoot).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("snap-") &&
        !referenced.contains(p.getFileName.toString))
      .toVector
    removed.foreach { dir =>
      Files.walk(dir).iterator().asScala.toVector.reverse.foreach(Files.delete)
    }
    removed.map(_.getFileName.toString.stripPrefix("snap-"))
  }
}
