package graft.table

import graft.fixtures.PagesGen
import graft.pipeline.Extract
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Table-maintenance contracts: compaction preserves row content while
  * reducing file count, commits a CHAINED manifest (time travel — the old
  * snapshot still reads), carries lineage metrics forward; expiry reclaims
  * exactly the unreferenced data and keeps the manifest history.
  */
class MaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val work = Files.createTempDirectory("graft_maint").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("compact: same rows, fewer files, chained manifest, old snapshot intact") {
    val pagesPath = s"$work/pages"
    PagesGen.write(spark, pagesPath, replicate = 1, buckets = 2)
    val outRoot = s"$work/table"
    Extract.run(spark, pagesPath, outRoot,
      Extract.Config(mode = "standard", buckets = 2, parallelism = 8,
        ocrEngine = "fake"))
    val table = new SnapshotTable(outRoot)
    val m0 = table.currentManifest.get
    val rowsBefore = Extract.readSnapshot(spark, outRoot)
      .select("url", "extracted_json").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toVector

    val res = Maintenance.compact(spark, outRoot, targetBytes = 1L << 30)
    assert(res.filesBefore > 2, s"fixture not fragmented: ${res.filesBefore} files")
    assert(res.filesAfter == 2, s"one file per bucket expected, got ${res.filesAfter}")

    val m1 = table.currentManifest.get
    assert(m1.version == m0.version + 1)
    assert(m1.parentId.contains(m0.snapshotId))
    assert(m1.snapshotId != m0.snapshotId)
    assert(m1.metrics == m0.metrics) // lineage describes the data, not the layout
    assert(m1.completedBuckets == m0.completedBuckets)

    val rowsAfter = Extract.readSnapshot(spark, outRoot)
      .select("url", "extracted_json").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toVector
    assert(rowsAfter == rowsBefore)

    // time travel: the PRE-compaction manifest still reads in full
    val oldDirs = m0.dataDirs.map(d => s"$outRoot/$d")
    assert(spark.read.parquet(oldDirs: _*).count() == rowsBefore.size.toLong)
  }

  test("expireSnapshots: reclaims only unreferenced data, keeps manifests") {
    val outRoot = s"$work/table"
    val table = new SnapshotTable(outRoot)
    val m1 = table.currentManifest.get // post-compaction
    val parentId = m1.parentId.get
    val dataRoot = Paths.get(outRoot, "data")
    def snapDirs = Files.list(dataRoot).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(snapDirs.contains(s"snap-$parentId"))

    val removed = Maintenance.expireSnapshots(outRoot, keepLast = 1)
    assert(removed == Vector(parentId))
    assert(!snapDirs.contains(s"snap-$parentId"))
    assert(snapDirs.contains(s"snap-${m1.snapshotId}"))

    // current snapshot unaffected; manifest history intact (auditable)
    assert(Extract.readSnapshot(spark, outRoot).count() > 0)
    (1 to m1.version).foreach(v => table.readManifest(v)) // none deleted
    // idempotent
    assert(Maintenance.expireSnapshots(outRoot, keepLast = 1).isEmpty)
  }
}
