package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Segmentation / vocabulary-relative contracts: sentence boundary rule on
  * hand-written text (abbreviation-free rule semantics, trailing-terminator
  * and no-terminator edges), OOV arithmetic vs a brute-force recount, TF-IDF
  * ranking parity with a literal reimplementation, and the scale-shape plan
  * pins (broadcast head for OOV, WindowGroupLimit for the TF-IDF rank
  * bound).
  */
class TextSegmentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("sentences: boundary rule, trailing terminator, no-terminator doc, empty doc") {
    val got = TextSegment.sentences(df(Seq(
        (1L, "First one. Second two! Third three? Tail no terminator"),
        (2L, "Ends with period. Exactly here."),
        (3L, "no terminators at all"),
        (4L, ""))),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0, "First one.", 2), (1L, 1, "Second two!", 2),
      (1L, 2, "Third three?", 2), (1L, 3, "Tail no terminator", 3),
      (2L, 0, "Ends with period.", 3), (2L, 1, "Exactly here.", 2),
      (3L, 0, "no terminators at all", 4)))
    // doc 4 (empty text) contributes no rows: trim+filter drops it
    assert(!got.exists(_._1 == 4L))
  }

  test("sentences: a terminator NOT followed by whitespace does not split (abbrev-ish)") {
    val got = TextSegment.sentences(
        df(Seq((1L, "v1.2 is out. See notes"))), "doc_id", "text")
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got == Seq((0, "v1.2 is out."), (1, "See notes")))
  }

  test("oovRate: brute-force recount, partitioning-invariant, broadcast head plan") {
    // 30 docs over a 12-word closed vocabulary + per-doc unique rare word
    val rows = (0L until 30L).map { i =>
      val common = (0 until 10).map(j => s"w${(i + j) % 12}")
      (i, (common :+ s"rare$i").mkString(" "))
    }
    val d = df(rows)
    val got = TextSegment.oovRate(d, "doc_id", "text", topK = 12)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // brute force: vocab head = top-12 by doc freq = exactly the w* words
    // (each w* appears in >=10 docs, each rare word in exactly 1)
    assert(got.size == 30)
    got.foreach { case (id, (nTok, nOov, permille)) =>
      assert(nTok == 11L, s"doc $id")
      assert(nOov == 1L, s"doc $id")
      assert(permille == 1000L / 11L, s"doc $id") // integer division: 90
    }
    val rep = TextSegment.oovRate(d.repartition(13), "doc_id", "text", topK = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rep == got.map { case (k, v) => k -> v._2 })
    val p = TextSegment.oovRate(d, "doc_id", "text", topK = 12)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"vocab head must broadcast:\n$p")
  }

  test("readability: hand-computed milli-unit scores, zero-sentence doc dropped") {
    // doc 1: "the cat sat. on a mat." -> W=6, S=2, syllables: the(1) cat(1)
    // sat.(1) on(1) a(1) mat.(1) = 6
    //   flesch = 206835 - (1015*6) div 2 - (84600*6) div 6
    //          = 206835 - 3045 - 84600 = 119190
    //   fk     = (390*6) div 2 + (11800*6) div 6 - 15590
    //          = 1170 + 11800 - 15590 = -2620
    // doc 2: no terminator -> the WHOLE text is one sentence (S=1):
    //   W=2, syll never(2)+ends(1)=3
    //   flesch = 206835 - 2030 - (84600*3) div 2 = 77905
    //   fk     = 780 + 17700 - 15590 = 2890
    // doc 3: empty text -> S=0 -> dropped (the only zero-sentence shape)
    val d = df(Seq((1L, "the cat sat. on a mat."), (2L, "never ends"),
        (3L, "")))
      .withColumn("t2", col("text"))
    val got = TextSegment.readability(d, "doc_id", "text", "t2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 6L, 2L, 6L, 119190L, -2620L),
      (2L, 2L, 1L, 3L, 77905L, 2890L)))
  }

  test("readability: vowel-group syllables floored at 1; plan stays scan-side") {
    // "strength" -> 1 group (e); "xyz" -> y counts ([aeiouy]) -> 1;
    // "bcdfg" -> 0 groups -> floored to 1; "queueing" -> qu(ueuei)ng = 1
    val d = df(Seq((1L, "strength xyz bcdfg queueing.")))
      .withColumn("t2", col("text"))
    val r = TextSegment.readability(d, "doc_id", "text", "t2").head()
    assert(r.getAs[Long]("n_syll") == 4L)
    assert(r.getAs[Long]("n_words") == 4L && r.getAs[Long]("n_sents") == 1L)
    val plan = TextSegment.readability(d, "doc_id", "text", "t2")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"readability must not shuffle:\n$plan")
  }

  test("tfidfTopK: literal reimplementation parity + WindowGroupLimit plan") {
    val rows = Seq(
      (0L, "alpha alpha beta gamma"),
      (1L, "alpha beta beta beta"),
      (2L, "gamma delta delta alpha"),
      (3L, "epsilon epsilon epsilon alpha"))
    val d = df(rows)
    val got = TextSegment.tfidfTopK(d, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
      .sortBy(r => (r._1, r._2)).toSeq
    // brute force with the documented integral arithmetic
    val toks = rows.map { case (id, t) => id -> t.split(" ").toSeq }
    val tf = toks.flatMap { case (id, ts) => ts.map(id -> _) }
      .groupBy(identity).map { case ((id, t), v) => (id, t, v.size.toLong) }
    val dfreq = tf.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val n = rows.size.toLong
    val want = tf.toSeq
      .map { case (id, t, f) => (id, t, f * ((n * 1000000L) / dfreq(t))) }
      .groupBy(_._1).toSeq.flatMap { case (id, items) =>
        items.sortBy { case (_, t, sc) => (-sc, t) }.take(2).zipWithIndex
          .map { case ((_, t, sc), i) => (id, (i + 1).toLong, t, sc) }
      }.sortBy(r => (r._1, r._2))
    assert(got == want)
    val p = TextSegment.tfidfTopK(d, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"rank bound must push map-side:\n$p")
  }
}
