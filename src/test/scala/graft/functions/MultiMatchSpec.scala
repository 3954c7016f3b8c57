package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick contracts: counts equal a per-position brute-force scan on
  * hostile inputs (self-overlaps, patterns that are prefixes/suffixes/
  * substrings of each other, multi-byte UTF-8), nulls propagate, the SQL
  * registration works, and interpreted eval equals the codegen'd kernel.
  */
class MultiMatchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** All occurrences, overlapping included — the definitional scan. */
  private def brute(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong

  private def viaDf(texts: Seq[String], patterns: Seq[String]): Seq[Seq[Long]] = {
    val s = spark; import s.implicits._
    texts.toDF("t")
      .select(graft.ops.CorpusSignals.multiMatchCounts(col("t"), patterns).as("c"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
  }

  test("counts equal the brute-force scan on overlap-hostile fixed cases") {
    val patterns = Seq("aa", "aaa", "ab", "ba", "a", "aba")
    val texts = Seq("aaaa", "ababab", "baaab", "", "b", "abaabaaabbb")
    val got = viaDf(texts, patterns)
    texts.zip(got).foreach { case (t, cs) =>
      patterns.zip(cs).foreach { case (p, c) =>
        assert(c == brute(t, p), s"'$p' in '$t'")
      }
    }
  }

  test("counts equal the brute-force scan on pseudo-random small-alphabet text") {
    val rnd = new scala.util.Random(17)
    val patterns = Seq("ab", "bb", "abc", "cab", "bca", "aaa", "c")
    val texts = Seq.fill(60)((0 until 80).map(_ => "abc" (rnd.nextInt(3))).mkString)
    val got = viaDf(texts, patterns)
    texts.zip(got).foreach { case (t, cs) =>
      patterns.zip(cs).foreach { case (p, c) =>
        assert(c == brute(t, p), s"'$p' in '$t'")
      }
    }
  }

  test("multi-byte UTF-8 patterns count at character-identical positions") {
    val patterns = Seq("héh", "éé", "日本", "本日", "é")
    val texts = Seq("héhéhé", "日本日本日", "ééé", "plain ascii")
    val got = viaDf(texts, patterns)
    texts.zip(got).foreach { case (t, cs) =>
      patterns.zip(cs).foreach { case (p, c) =>
        assert(c == brute(t, p), s"'$p' in '$t'")
      }
    }
  }

  test("null text propagates; empty text counts zero everywhere") {
    val s = spark; import s.implicits._
    val rows = Seq[(java.lang.Long, String)]((1L, null), (2L, ""))
      .toDF("id", "t")
      .select(graft.ops.CorpusSignals.multiMatchCounts(col("t"), Seq("x", "yz")))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[Long](0) == Seq(0L, 0L))
  }

  test("SQL registration: multi_match(t, literals...) with literal-only patterns") {
    val s = spark; import s.implicits._
    MultiMatch.register(spark)
    Seq("abcabc").toDF("t").createOrReplaceTempView("mm_in")
    val got = spark.sql("SELECT multi_match(t, 'abc', 'ca', 'zz') FROM mm_in")
      .head().getSeq[Long](0)
    assert(got == Seq(2L, 1L, 0L))
    val err = intercept[Exception] {
      spark.sql("SELECT multi_match(t, t) FROM mm_in").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("interpreted eval equals the codegen'd kernel") {
    val in = "abaabaaab" * 7
    val patterns = Seq("aab", "ab", "ba")
    val interpreted = MultiMatch(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(in)), patterns)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(interpreted == patterns.map(p => brute(in, p)))
    assert(interpreted == viaDf(Seq(in), patterns).head)
  }
}
