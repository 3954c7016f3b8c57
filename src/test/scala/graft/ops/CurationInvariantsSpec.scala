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
