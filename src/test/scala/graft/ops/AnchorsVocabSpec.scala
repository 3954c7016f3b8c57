package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing anchors (rolling_anchors / sharedAnchors) and the vocabulary
  * head: direct-definition hash parity, the shared-substring guarantee,
  * and deterministic top-k.
  */
class AnchorsVocabSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val B = 257L
  private val P = 1000000007L

  /** Direct definition: hash of every gram position, RollingFingerprint's
    * arithmetic (m=min(n,len), max(len-n+1,1) grams), filtered mod.
    */
  private def refAnchors(text: String, n: Int, modulus: Int): Seq[(Int, Long)] = {
    val cps = text.codePoints().toArray
    val len = cps.length
    val m = math.min(n, len)
    val count = math.max(len - n + 1, 1)
    (0 until count).flatMap { i =>
      var h = 0L
      (0 until m).foreach(j => h = (h * B + cps(i + j)) % P)
      if (h % modulus == 0) Some((i + 1, h)) else None
    }
  }

  private def kernelAnchors(text: String, n: Int, modulus: Int): Seq[(Int, Long)] = {
    val s = spark; import s.implicits._
    Seq(text).toDF("t")
      .select(TextDedup.anchorRows(col("t"), n, modulus))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
  }

  test("rolling_anchors matches the direct definition (incl. short/empty/multi-byte)") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefé日 "
    val cases = Seq("", "a", "abcdefghijk", "aaaaaaaaaaaaaaaaaaaa") ++
      (1 to 30).map(_ => Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length))).mkString)
    for (t <- cases; n <- Seq(4, 12); m <- Seq(1, 2, 8)) {
      assert(kernelAnchors(t, n, m) == refAnchors(t, n, m), s"text='$t' n=$n mod=$m")
    }
  }

  test("rolling_anchors: null text emits nothing") {
    val df = spark.range(1).select(lit(null).cast("string").as("t"))
    assert(df.select(TextDedup.anchorRows(col("t"), 8, 2)).count() == 0)
  }

  test("anchor hashes equal RollingFingerprint's hash family (mod 1 = every position)") {
    val s = spark; import s.implicits._
    val t = "the quick brown fox jumps over the lazy dog"
    val anchors = kernelAnchors(t, 8, 1)
    val fp = Seq(t).toDF("t")
      .select(org.apache.spark.sql.GraftBridge.column(
        graft.functions.RollingFingerprint(
          org.apache.spark.sql.GraftBridge.expression(col("t")), 8)).as("fp"))
      .select("fp.fp_min", "fp.fp_max").head()
    assert(anchors.map(_._2).min == fp.getLong(0))
    assert(anchors.map(_._2).max == fp.getLong(1))
  }

  test("sharedAnchors: docs sharing a long run share anchors; disjoint docs don't") {
    val s = spark; import s.implicits._
    val boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR UPDATES " * 2
    val docs = Seq(
      (1L, s"alpha content one $boiler tail a"),
      (2L, s"totally different beta $boiler other tail"),
      (3L, "nothing in common with anybody here at all zzz qqq")).toDF("id", "text")
    val shared = TextDedup.sharedAnchors(docs, "id", "text", n = 12, modulus = 2)
      .collect()
    assert(shared.nonEmpty, "an 80-char shared run must produce shared anchors")
    assert(shared.forall(_.getAs[Long]("n_docs") == 2L))
    assert(shared.forall(_.getAs[Long]("min_id") == 1L))
    // doc 3 shares nothing: no anchor group includes it (n_docs would be 3)
  }

  test("vocab: exact counts, doc-frequency order, token tie-break, top-k cut") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "b a a c"), (2L, "a b"), (3L, "b d")).toDF("id", "text")
    val v = CorpusSignals.vocab(docs, "id", "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // df: a=2 b=3 c=1 d=1 ; order: b(3), a(2), then c before d by token
    assert(v == Seq(("b", 3L, 3L), ("a", 2L, 3L), ("c", 1L, 1L)))
  }
}
