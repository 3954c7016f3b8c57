package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup contracts: identical vectors always share a cell and dedup to
  * one survivor; the component/keep decision equals a brute-force
  * union-find over the within-cell near-dup graph; a threshold no pair
  * reaches keeps everything (the empty-edge path converges).
  */
class SemDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit =
    if (spark != null) { TextDedup.releaseCaches(); spark.stop() }

  // --- the operator's exact arithmetic, reimplemented directly -------------
  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    var d = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Corpus: 3 loose clusters in R^8 plus planted duplicates. Deterministic. */
  private def vectors: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(47)
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val base = (0L until 60L).map { i =>
      val c = centers((i % 3).toInt)
      i -> c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq
    }
    // exact copies of vectors 0 and 1, and a near-copy of 2
    val dups = Seq(
      60L -> base(0)._2,
      61L -> base(0)._2,
      62L -> base(1)._2,
      63L -> base(2)._2.map(x => x + 0.001f))
    base ++ dups
  }

  test("semDedup equals brute-force union-find over the within-cell graph") {
    val s = spark; import s.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val got = VectorSim.semDedup(df, "vec_id", "embedding", minCosine = 0.97, c = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.size == vectors.size, "one row per input vector")

    // brute-force reference: edges = same-cell pairs with exact quantized
    // cosine >= tau (cells from the operator's own oracle-verified
    // assignment), components by union-find, rep = min id.
    val q = vectors.map { case (id, v) => id -> quant(v) }.toMap
    val cellOf = got.view.mapValues(_._1).toMap
    val ids = vectors.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (a <- ids; b <- ids if a < b)
      if (cellOf(a) == cellOf(b) && cos(q(a), q(b)) >= 0.97) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val expRep = ids.map(i => i -> find(i)).toMap
    for (i <- ids) {
      assert(got(i)._2 == expRep(i), s"rep mismatch for $i")
      assert(got(i)._3 == (expRep(i) == i), s"keep mismatch for $i")
    }
    // the planted exact duplicates actually deduped
    assert(!got(60L)._3 && !got(61L)._3, "copies of vec 0 must not survive")
    assert(!got(62L)._3, "copy of vec 1 must not survive")
    assert(got.values.count(_._3) < vectors.size)
  }

  test("identical vectors always share a cell (tie-broken argmax) and keep one") {
    val s = spark; import s.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val got = VectorSim.semDedup(df, "vec_id", "embedding", minCosine = 0.999999, c = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(3)))).toMap
    // 0, 60, 61 are byte-identical embeddings: same cosine to every
    // centroid, deterministic tie-break → same cell, one survivor (min id)
    assert(got(0L)._1 == got(60L)._1 && got(0L)._1 == got(61L)._1)
    assert(got(0L)._2 && !got(60L)._2 && !got(61L)._2)
  }

  test("a threshold above every pair keeps everything (empty edge set)") {
    val s = spark; import s.implicits._
    // distinct random-ish vectors only (no planted duplicates)
    val df = vectors.take(9).toDF("vec_id", "embedding")
    val got = VectorSim.semDedup(df, "vec_id", "embedding", minCosine = 1.1, c = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(got.length == 9)
    assert(got.forall { case (id, rep, keep) => rep == id && keep })
  }
}
