package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The two connected-components implementations must agree exactly: the
  * simple min-label propagation (diameter-bound rounds, the dense-graph
  * default) and the large-star/small-star edge rewriting (Kiveris
  * SoCC'14, the adversarial-diameter path). Exercised over the shapes
  * that break naive formulations: long paths with shuffled ids (the min
  * sits mid-chain), stars, cliques bridged by chains, random graphs with
  * singleton-free vertex sets, and parallel/reversed duplicate edges.
  */
class CcEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def compare(pairs: Seq[(Long, Long)], clue: String): Unit = {
    val s = spark; import s.implicits._
    val df = pairs.toDF("id_a", "id_b")
    val simple = TextDedup.dedupClusters(df, maxRounds = 80)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextDedup.releaseCaches()
    val stars = TextDedup.dedupClustersStars(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(simple == stars, s"$clue: implementations disagree")
    // sanity: every label is the min of its own component under `simple`
    simple.groupBy(_._2).foreach { case (root, members) =>
      assert(members.keys.min == root, s"$clue: root $root is not the component min")
    }
  }

  test("long path with shuffled ids (min mid-chain)") {
    val perm = new scala.util.Random(7).shuffle((0L until 40L).toVector)
    compare(perm.sliding(2).map(p => (p(0), p(1))).toSeq, "path-40")
  }

  test("star, bridged cliques, parallel + reversed edges") {
    val star = (1L to 12L).map(i => (100L, 100L + i))
    val cliqueA = for (i <- 0 until 5; j <- i + 1 until 5) yield (200L + i, 200L + j)
    val cliqueB = for (i <- 0 until 5; j <- i + 1 until 5) yield (300L + i, 300L + j)
    val bridge = Seq((204L, 250L), (250L, 251L), (251L, 300L))
    val dups = Seq((101L, 100L), (100L, 101L)) // reversed + parallel
    compare(star ++ cliqueA ++ cliqueB ++ bridge ++ dups, "star+cliques")
  }

  test("spark.graft.checkpoint=reliable: same clusters, durable checkpoint files") {
    val s = spark; import s.implicits._
    val perm = new scala.util.Random(11).shuffle((0L until 30L).toVector)
    val df = perm.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("id_a", "id_b")
    s.conf.set(Checkpointer.ConfKey, "local")
    val viaLocal = TextDedup.dedupClusters(df, maxRounds = 80)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextDedup.releaseCaches()
    // reliable without a checkpoint dir must fail fast with a pointed message
    s.conf.set(Checkpointer.ConfKey, "reliable")
    try {
      val err = intercept[IllegalArgumentException](
        TextDedup.dedupClusters(df, maxRounds = 80).collect())
      assert(err.getMessage.contains("setCheckpointDir"))
      TextDedup.releaseCaches()
      val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
      s.sparkContext.setCheckpointDir(ckptDir.toString)
      val viaReliable = TextDedup.dedupClusters(df, maxRounds = 80)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      TextDedup.releaseCaches()
      assert(viaReliable == viaLocal, "reliable path changed the clustering")
      // evidence the rounds actually wrote durable RDD checkpoints
      import scala.jdk.CollectionConverters._
      def partFiles(dir: java.nio.file.Path): Long =
        java.nio.file.Files.walk(dir).iterator().asScala
          .count(p => p.getFileName.toString.startsWith("part-"))
      assert(partFiles(ckptDir) > 0, "no checkpoint files written under the reliable path")
      // conf UNSET + checkpoint dir present → reliable is the DEFAULT: a
      // deployment that configured a durable dir gets loss tolerance
      // without knowing about the second flag
      s.conf.unset(Checkpointer.ConfKey)
      val ckptDir2 = java.nio.file.Files.createTempDirectory("graft_ckpt_default")
      s.sparkContext.setCheckpointDir(ckptDir2.toString)
      val viaDefault = TextDedup.dedupClusters(df, maxRounds = 80)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      TextDedup.releaseCaches()
      assert(viaDefault == viaLocal, "default-reliable path changed the clustering")
      assert(partFiles(ckptDir2) > 0,
        "checkpoint dir configured but the default path wrote no durable checkpoints")
    } finally s.conf.set(Checkpointer.ConfKey, "local")
  }

  test("random graphs across seeds (incl. many small components)") {
    (1 to 4).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val n = 60
      val edges = (0 until 70).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      compare(edges, s"random-$seed")
    }
  }
}
