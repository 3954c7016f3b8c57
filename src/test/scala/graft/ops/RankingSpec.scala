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

  test("postings: flat (term, doc) rows with exact tf and the doc length") {
    val s = spark; import s.implicits._
    val got = Ranking.postings(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val exp = docs.flatMap { case (id, t) =>
      val toks = t.split(" ", -1).toSeq
      toks.distinct.map(w => (w, id) -> ((toks.count(_ == w).toLong, toks.size.toDouble)))
    }.toMap
    assert(got == exp)
  }

  test("searchTopK score is bit-identical to bm25 for a sorted term list") {
    val s = spark; import s.implicits._
    val df = docs.toDF("doc_id", "text")
    // terms alphabetically ordered: bm25 sums left-to-right in given order,
    // searchTopK folds in ascending term order — same order, and bm25's
    // zero-tf terms add an exact +0.0, so the doubles must agree bitwise
    val sorted = terms.sorted
    val viaIndex = Ranking.searchTopK(df, "doc_id", "text",
        queries = Seq(7L -> sorted), k = 100)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val direct = Ranking.bm25(df, "doc_id", "text", sorted)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(viaIndex == direct)
  }

  test("searchTopK: disjunctive partial matches, absent terms, k cutoff, rank ties") {
    val s = spark; import s.implicits._
    val df = docs.toDF("doc_id", "text")
    val got = Ranking.searchTopK(df, "doc_id", "text",
        queries = Seq(
          0L -> Seq("spark", "nosuchtoken"),
          1L -> Seq("nosuchtoken"),
          2L -> Seq("filler", "hash")),
        k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4)) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // query 1 matches nothing and is absent entirely
    assert(!got.keys.exists(_._1 == 1L))
    // query 0: 'spark' docs only, n_terms = 1, top-2 of the three spark docs
    assert(got((0L, 1))._2 == 1L && got((0L, 2))._2 == 1L)
    // query 2 matched docs: 2 (hash), 5 (hash), 6 (filler) — k=2 keeps two
    assert(got.keys.count(_._1 == 2L) == 2)
  }

  test("searchTopK plan: query/df/stats joins broadcast; no BNLJ") {
    val s = spark; import s.implicits._
    val plan = Ranking.searchTopK(docs.toDF("doc_id", "text"), "doc_id", "text",
        queries = Seq(0L -> Seq("spark", "hash")), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastNestedLoopJoin BuildRight"),
      "only the 1-row stats cross join may nest")
    assert(plan.contains("BroadcastHashJoin"), "term joins must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }
}
