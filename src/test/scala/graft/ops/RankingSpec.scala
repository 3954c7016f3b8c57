package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BM25 contracts: score equals a direct recomputation of the documented
  * formula (same parenthesization — the float chain IS the contract),
  * ranking behaves (rare-term hits outrank common-term hits; more hits
  * outrank fewer), and the result is partitioning-invariant bit for bit.
  */
class RankingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val docs = Seq(
    (0L, "spark shuffles data across the cluster"),
    (1L, "spark spark spark everywhere spark"),
    (2L, "hash joins beat sort merge joins here"),
    (3L, "window functions rank rows per partition"),
    (4L, "no relevant words at all in this one"),
    (5L, "spark hash window spark hash window"),
    (6L, "plain filler text body filler plain text"))
  private val terms = Seq("spark", "hash", "window")

  private def reference: Map[Long, (Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.size.toDouble
    val sdl = toks.values.map(_.size.toDouble).sum
    val dfs = terms.map(t => toks.values.count(_.contains(t)).toDouble)
    docs.flatMap { case (id, _) =>
      val dl = toks(id).size.toDouble
      val tfs = terms.map(t => toks(id).count(_ == t).toDouble)
      // EXACT parenthesization of the operator (and the q_bm25 oracle)
      val score = terms.indices.map { i =>
        ((n - dfs(i) + 0.5) / (dfs(i) + 0.5)) *
          ((tfs(i) * 2.5) / (tfs(i) + 1.5 * (0.25 + 0.75 * (dl / (sdl / n)))))
      }.reduce(_ + _)
      val hits = tfs.count(_ > 0).toLong
      if (hits > 0) Some(id -> ((hits, score))) else None
    }.toMap
  }

  test("bm25 equals the direct formula bit for bit; non-hit docs are absent") {
    val s = spark; import s.implicits._
    val got = Ranking.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == reference) // Map equality on Double: exact bit agreement
    assert(!got.contains(4L) && !got.contains(6L))
  }

  test("ranking shape: repeated hits and multi-term hits outrank single hits") {
    val s = spark; import s.implicits._
    val got = Ranking.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got(1L) > got(0L), "tf saturation still orders 4x-spark above 1x")
    assert(got(5L) > got(0L), "three matched terms outrank one")
  }

  test("bit-identical under repartitioning (integral sums keep stats exact)") {
    val s = spark; import s.implicits._
    val a = Ranking.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Ranking.bm25(docs.toDF("doc_id", "text").repartition(7),
        "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}
