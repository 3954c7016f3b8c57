package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer contracts, pinned against a hand-run of the Sennrich
  * algorithm: frequency-then-lexicographic merge selection, left-to-right
  * non-overlapping rewrite, </w> end-marker semantics, vocab-level (not
  * corpus-level) iteration, and tokenization via the learned segmentation.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("trainMerges reproduces a hand-run of the algorithm") {
    val s = spark
    import s.implicits._
    // corpus: "low" x3, "lowest" x2  (one doc per occurrence)
    val df = (Seq.fill(3)("low") ++ Seq.fill(2)("lowest")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    // hand-run, pair counts over {low:3, lowest:2}:
    //  r1: (l,o)=5, (o,w)=5, (w,</w>)=3, (w,e)=2, ... -> tie 5: (l,o) < (o,w) -> merge lo
    //  r2: (lo,w)=5 wins -> merge low
    //  r3: (low,</w>)=3 vs (low,e)=2 ... -> merge low</w>
    val (merges, seg) = Bpe.trainMerges(df, "text", k = 3)
    val got = merges.orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "l", "o", 5L),
      (2L, "lo", "w", 5L),
      (3L, "low", "</w>", 3L)))
    val segs = seg.orderBy("word").collect()
      .map(r => (r.getString(0), r.getSeq[String](2).toList)).toMap
    assert(segs("low") == List("low</w>"))
    assert(segs("lowest") == List("low", "e", "s", "t", "</w>"))
  }

  test("rewrite is left-to-right non-overlapping ('aaa' + merge(a,a) -> [aa, a])") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val (merges, seg) = Bpe.trainMerges(df, "text", k = 1)
    val m = merges.collect().map(r => (r.getString(1), r.getString(2))).head
    assert(m == ("a", "a")) // (a,a)=4 beats (a,</w>)=2
    val syms = seg.collect().map(_.getSeq[String](2).toList).head
    assert(syms == List("aa", "a", "</w>"))
  }

  test("tokenize: per-doc reassembly in word order with learned pieces") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "low low low lowest lowest")).toDF("doc_id", "text")
    val (_, seg) = Bpe.trainMerges(train, "text", k = 3)
    val docs = Seq((7L, "lowest low")).toDF("doc_id", "text")
    val toks = Bpe.tokenize(docs, "doc_id", "text", seg).collect().head
    assert(toks.getLong(1) == 6L) // [low e s t </w>] + [low</w>]
    assert(toks.getString(2) == "low e s t </w> low</w>")
  }

  test("k beyond the learnable merges stops early with the vocab intact") {
    val s = spark
    import s.implicits._
    // single word "ab": learnable merges are (a,b) then (ab,</w>), after
    // which every word is one symbol and the pair table is EMPTY. A k past
    // that point must return the merges learned so far — and must not let
    // the empty-best crossJoin wipe the vocab.
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    val (merges, seg) = Bpe.trainMerges(df, "text", k = 10)
    val got = merges.orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("a", "b"), ("ab", "</w>")))
    val rows = seg.collect()
    assert(rows.length == 1, "vocab must survive merge exhaustion")
    assert(rows.head.getSeq[String](2).toList == List("ab</w>"))
  }

  test("determinism across partitionings (ties, fold, reassembly)") {
    val s = spark
    import s.implicits._
    val df = (0L until 60L).map(i => (i, s"pack my box with w${i % 7} judge"))
      .toDF("doc_id", "text")
    val (m1, _) = Bpe.trainMerges(df, "text", k = 4)
    val (m2, _) = Bpe.trainMerges(df.repartition(13), "text", k = 4)
    val a = m1.collect().map(_.toString).sorted.toSeq
    val b = m2.collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("batched training: top-m disjoint pairs per round, hand-run pinned") {
    val s = spark
    import s.implicits._
    // three words over disjoint alphabets; frequencies well separated
    val df = (Seq.fill(10)("ab") ++ Seq.fill(6)("cd") ++ Seq.fill(3)("ef"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    // batch m=3 over the ROUND-1 counts: (a,b)=10 selected; (b,</w>)=10
    // shares b -> rejected; (c,d)=6 selected; (d,</w>)=6 rejected;
    // (e,f)=3 selected; (f,</w>)=3 rejected. Count staleness is the batched
    // contract: sequential BPE would have taken (ab,</w>)=10 at round 2.
    val (merges, seg) = Bpe.trainMerges(df, "text", k = 3, batch = 3)
    val got = merges.orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", 10L), (2L, "c", "d", 6L), (3L, "e", "f", 3L)))
    val segs = seg.orderBy("word").collect()
      .map(r => (r.getString(0), r.getSeq[String](2).toList)).toMap
    assert(segs("ab") == List("ab", "</w>"))
    assert(segs("cd") == List("cd", "</w>"))
    assert(segs("ef") == List("ef", "</w>"))
  }

  test("batched selection skips interfering pairs and applies one pass") {
    val s = spark
    import s.implicits._
    val df = (0 until 5).map(i => (i.toLong, "abc")).toDF("doc_id", "text")
    // round-1 counts all 5: (a,b), (b,c), (c,</w>). Greedy order
    // (a,b) < (b,c) < (c,</w>): (a,b) taken; (b,c) shares b -> skipped;
    // (c,</w>) disjoint -> taken. One pass: a b c </w> -> [ab, c</w>].
    val (merges, seg) = Bpe.trainMerges(df, "text", k = 2, batch = 2)
    val got = merges.orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("a", "b"), ("c", "</w>")))
    assert(seg.collect().head.getSeq[String](2).toList == List("ab", "c</w>"))
  }

  test("batch=1 is bit-identical to the exact sequential path") {
    val s = spark
    import s.implicits._
    val df = (0L until 40L).map(i => (i, s"the quick brown fox f${i % 5}"))
      .toDF("doc_id", "text")
    val (m1, g1) = Bpe.trainMerges(df, "text", k = 5)
    val (m2, g2) = Bpe.trainMerges(df, "text", k = 5, batch = 1)
    assert(m1.collect().map(_.toString).sorted.toSeq ==
      m2.collect().map(_.toString).sorted.toSeq)
    assert(g1.collect().map(_.toString).sorted.toSeq ==
      g2.collect().map(_.toString).sorted.toSeq)
  }
}
