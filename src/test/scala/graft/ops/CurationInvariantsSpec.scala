package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the late-round curation operators on a seeded
  * random corpus — the properties that must hold for ANY input, checked on
  * one adversarially-shaped draw (heavy duplication, skewed sources,
  * single-token docs, empty-ish docs).
  */
class CurationInvariantsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val corpus = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260818L)
    val vocab = Vector("the", "fast", "key", "sort", "scan", "dup", "x9")
    (0L until 400L).map { i =>
      val n = 1 + rnd.nextInt(40)
      // every third doc repeats a shared boilerplate span -> real dup lines
      val words =
        (if (i % 3 == 0) Vector("all", "rights", "reserved") else Vector.empty) ++
          Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
      (i, words.mkString(" "), s"s${i % 4}")
    }.toDF("doc_id", "text", "source")
  }

  test("curate2: phrase gate bites, dedup sees THROUGH invisible chars, cap holds") {
    val s = spark
    import s.implicits._
    // duplicates differing only by planted invisible chars must collapse
    // (the sanitize stage runs BEFORE the dedup hash); docs carrying the
    // blocked phrase must vanish; no source exceeds the cap
    val rows = (0L until 120L).map { i =>
      val body =
        if (i % 10 == 0) s"contains the dup scan key body ${(i / 10) % 2}" // 12 docs, 2 texts
        else if (i % 7 == 0) s"bad phrase here in doc $i"
        else s"regular doc $i with the fast sort scan words"
      val planted = if (i % 2 == 0) "\u200b" + body + "\u2066" else body
      (i, planted, s"s${i % 3}")
    }.toDF("doc_id", "text", "source")
    val out = Curation.curate2(rows, "doc_id", "text", "source",
        phrases = Seq("bad phrase"), cap = 25L, budget = 50L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ids = out.map(_._1).toSet
    // every blocked doc is gone
    assert((0L until 120L).filter(i => i % 7 == 0 && i % 10 != 0)
      .forall(!ids.contains(_)), "phrase gate must drop every hit")
    // the 12 planted near-duplicates (2 distinct CLEAN texts) keep exactly 2
    assert(ids.count(_ % 10 == 0) == 2,
      "invisible-char variants must dedup to one survivor per clean text")
    assert(ids.count(i => i % 10 == 0 && i < 20) == 2, "first ids win")
    // cap per source
    out.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.length <= 25, s"source $src over cap")
    }
    // packing: within each source, pack ids are a contiguous 0-based range
    out.groupBy(_._2).foreach { case (src, rs) =>
      val packs = rs.map(_._4).distinct.sorted
      assert(packs.head == 0L && packs.sameElements(0L until packs.length.toLong), src)
    }
  }

  test("lineDedup: conservation, survivor uniqueness, survivors are original lines") {
    val lines: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => split(t, " ") // 1-word "lines": maximal duplication pressure
    val out = TextDedup.lineDedup(corpus, "doc_id", "text", lines, sep = " ")
    val agg = out.agg(
      sum(col("n_kept")), sum(col("n_dropped")),
      sum(when(col("n_kept") < 1, 1).otherwise(0))).head()
    // conservation over PRESENT docs (a doc whose every line occurred
    // earlier elsewhere vanishes from the output, by contract)
    val presentLines = corpus.join(out.select("doc_id"), Seq("doc_id"))
      .select(explode(split(col("text"), " "))).count()
    assert(agg.getLong(0) + agg.getLong(1) == presentLines)
    assert(agg.getLong(2) == 0L) // present docs kept >= 1 line
    // keep-first: exactly one survivor per distinct line across the corpus
    val distinctLines = corpus.select(explode(split(col("text"), " "))).distinct().count()
    assert(agg.getLong(0) == distinctLines)
    // survivors, re-split, are a sub-multiset of the corpus lines
    val bad = out.select(explode(split(col("text_dedup"), " ")).as("l"))
      .join(corpus.select(explode(split(col("text"), " ")).as("l")).distinct(),
        Seq("l"), "left_anti").count()
    assert(bad == 0L)
  }

  test("mixByTokenBudget: subset, per-source token mass never exceeds the input's") {
    val d = corpus.withColumn("toks", size(split(col("text"), " ")).cast("long"))
    val w = Map("s0" -> 5L, "s1" -> 1L, "s2" -> 0L, "s3" -> 2L)
    val out = Sampling.mixByTokenBudget(d, "doc_id", "toks", "source", w, salt = "inv")
    val in = d.select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(in) && kept.nonEmpty)
    val tokIn = d.groupBy("source").agg(sum("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tokOut = out.groupBy("source").agg(sum("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!tokOut.contains("s2")) // weight 0 drops
    tokOut.foreach { case (src, t) => assert(t <= tokIn(src)) }
  }

  test("lmScore: per-doc averages stay inside the probability scale") {
    val ref = Sampling.hashSample(corpus, "doc_id", 0.3, salt = "ref")
    val out = QualityModel.lmScore(corpus, ref, "doc_id", "text")
    val r = out.agg(min("lm_avg"), max("lm_avg"), min("n_bigrams")).head()
    assert(r.getLong(0) >= 0L && r.getLong(1) <= QualityModel.LmScale)
    assert(r.getLong(2) >= 1L)
  }

  test("pagerank: mass bounds — every node at least the teleport floor, total under scale") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val edges = (0 until 300).map { _ =>
      (s"h${rnd.nextInt(20)}", s"h${rnd.nextInt(20)}")
    }.toDF("src", "dst")
    val pr = WebGraph.pagerank(edges, iters = 5)
    val n = pr.count()
    val tele = (15L * 1000000000L) / (100L * n)
    val ranks = pr.collect().map(_.getLong(1))
    assert(ranks.min >= tele)
    assert(ranks.sum <= 1000000000L) // floor division only loses mass
  }
}
