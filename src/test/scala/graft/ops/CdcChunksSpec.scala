package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking and the duplicated-span statistics built on
  * it: chunk boundaries match the direct anchor definition, chunks cover
  * the text exactly, shared substrings chunk identically (the property
  * that makes corpus-wide span dedup a hash groupBy), and dupSpanStats
  * equals a brute-force computation.
  */
class CdcChunksSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Direct definition: starts = 1 ∪ anchor positions > 1, chunks between
    * consecutive starts (code-point slices), last chunk to the end.
    */
  private def refChunks(text: String, n: Int, modulus: Int): Seq[String] = {
    val cps = text.codePoints().toArray
    val len = cps.length
    if (len == 0) return Nil
    val m = math.min(n, len)
    val count = math.max(len - n + 1, 1)
    val anchors = (0 until count).flatMap { i =>
      var h = 0L
      (0 until m).foreach(j => h = (h * B + cps(i + j)) % P)
      if (h % modulus == 0) Some(i + 1) else None
    }
    val starts = 1 +: anchors.filter(_ > 1)
    starts.zip(starts.drop(1) :+ (len + 1)).map { case (s, e) =>
      new String(cps, s - 1, e - s)
    }
  }

  private def kernelChunks(text: String, n: Int, modulus: Int): Seq[(Int, String)] = {
    val s = spark; import s.implicits._
    Seq(text).toDF("t")
      .select(TextDedup.cdcChunkRows(col("t"), n, modulus))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
  }

  test("cdc_chunks matches the direct definition and covers the text exactly") {
    val rnd = new scala.util.Random(23)
    val alpha = "abé日 "
    val cases = Seq("", "a", "abcdefghijk", "aaaaaaaaaaaaaaaaaaaaaaaa") ++
      (1 to 30).map(_ => Seq.fill(rnd.nextInt(120))(alpha(rnd.nextInt(alpha.length))).mkString)
    for (t <- cases; n <- Seq(4, 12); m <- Seq(1, 2, 8)) {
      val got = kernelChunks(t, n, m)
      assert(got.map(_._2) == refChunks(t, n, m), s"text='$t' n=$n mod=$m")
      assert(got.map(_._1) == (1 to got.length), "indices are 1..k in order")
      assert(got.map(_._2).mkString == t, "chunks must reassemble to the text")
      assert(got.forall(_._2.nonEmpty), "no empty chunks")
    }
  }

  test("shared substrings chunk identically past the first boundary") {
    // Two docs sharing a long run: every interior chunk of the shared run
    // must appear in both docs' chunk sets — the property that turns
    // corpus-wide span dedup into one groupBy.
    val rnd = new scala.util.Random(5)
    val shared = Seq.fill(800)(('a' + rnd.nextInt(20)).toChar).mkString
    val a = "PREFIX-ONE " + shared + " SUFFIX-ONE"
    val b = "completely different lead-in text " + shared + " other tail"
    val ca = kernelChunks(a, 12, 8).map(_._2)
    val cb = kernelChunks(b, 12, 8).map(_._2)
    val common = ca.toSet.intersect(cb.toSet)
    // interior chunks (drop first/last which straddle the unshared context)
    val interior = common.filter(c => shared.contains(c))
    assert(interior.nonEmpty, s"expected shared interior chunks, got none " +
      s"(|ca|=${ca.size}, |cb|=${cb.size})")
    // .toSeq before mapping to lengths: a Set[Int] of lengths would collapse
    // equal-length chunks and undercount
    assert(interior.toSeq.map(_.length).sum >= shared.length / 2,
      s"most shared-run bytes should live in common chunks " +
        s"(got ${interior.toSeq.map(_.length).sum} of ${shared.length})")
  }

  test("dupSpanStats equals the brute-force definition") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(17)
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0L until 40L).map { i =>
      val noise = Seq.fill(30 + rnd.nextInt(60))(('a' + rnd.nextInt(6)).toChar).mkString
      val t = if (i % 3 == 0) noise + boiler + noise.reverse else noise
      (i, t)
    }
    val df = docs.toDF("doc_id", "text")
    val got = TextDedup.dupSpanStats(df, "doc_id", "text", n = 12, modulus = 8)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    // brute force over the direct chunk definition
    val chunksByDoc = docs.map { case (id, t) => id -> refChunks(t, 12, 8) }.toMap
    val docsByChunk = chunksByDoc.toSeq
      .flatMap { case (id, cs) => cs.distinct.map(c => c -> id) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet.size).toMap
    val exp = chunksByDoc.map { case (id, cs) =>
      val hot = cs.filter(c => docsByChunk(c) >= 2)
      id -> ((cs.size.toLong, hot.size.toLong,
        cs.map(_.length.toLong).sum, hot.map(_.length.toLong).sum))
    }
    assert(got == exp)
    // the planted boilerplate is actually detected
    assert(got(0L)._4 > 0, "boilerplate docs must show dup chars")
    assert(exp.values.exists(_._4 == 0L), "pure-noise docs stay clean")
  }

  test("dupSpanRewrite equals the brute-force keep-first surgery") {
    val s = spark
    import s.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      0L -> s"$shared unique tail zero",
      1L -> s"prefix one $shared",
      2L -> "completely unrelated text with no duplicated spans at all",
      3L -> s"$shared $shared") // within-doc repeat of a cross-doc span
    val got = TextDedup.dupSpanRewrite(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 12, modulus = 8, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // brute force: chunk every doc, find chunks in >=2 distinct docs, keep
    // only the global first (doc_id, idx) occurrence of each hot chunk
    val chunks = docs.map { case (id, t) =>
      id -> refChunks(t, 12, 8).zipWithIndex.map { case (c, i) => (i + 1, c) } }
    val docsPerChunk = chunks
      .flatMap { case (id, cs) => cs.map(_._2).distinct.map(_ -> id) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet.size).toMap
    val firstOcc = chunks
      .flatMap { case (id, cs) => cs.map { case (i, c) => (c, (id, i)) } }
      .groupMapReduce(_._1)(_._2)((a, b) => if (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) a else b)
    val exp = chunks.map { case (id, cs) =>
      val kept = cs.filter { case (i, c) =>
        docsPerChunk(c) < 2 || firstOcc(c) == ((id, i)) }
      id -> ((cs.size.toLong, (cs.size - kept.size).toLong,
        kept.map(_._2).mkString))
    }.toMap
    assert(got == exp)
    assert(got(0L)._2 == 0L, "first occurrence keeps its spans")
    assert(got(1L)._2 > 0L, "later copy loses the shared span")
    // surgery is exact: untouched docs reassemble byte-identically
    assert(got(2L)._3 == docs(2)._2)
    // partitioning-invariant (the arg-min winner is global, not per-task)
    val got2 = TextDedup.dupSpanRewrite(docs.toDF("doc_id", "text").repartition(5),
        "doc_id", "text", n = 12, modulus = 8, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got2 == got)
  }
}
