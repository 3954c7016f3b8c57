package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the temporal joins and the bloom-accelerated incremental
  * dedup: each checked against a brute-force direct definition computed in
  * plain Scala, plus the edge rules (tie inclusivity, bin-boundary and
  * negative-epoch bins, bloom exactness = anti-join equality).
  */
class TemporalIncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  // -------------------------------------------------------------- asofJoin

  private def leftDf: DataFrame = {
    val s = spark; import s.implicits._
    Seq( // (id, key, t, payload)
      (1L, "a", ts(5), 10.0),  // before any right row -> nulls
      (2L, "a", ts(10), 20.0), // exact tie with right @10 -> tie visible
      (3L, "a", ts(20), 30.0), // picks right @15, not @10
      (4L, "b", ts(30), 40.0), // other key: picks b's own row, not a's
      (5L, "c", ts(30), 50.0)  // key with no right rows at all -> nulls
    ).toDF("event_id", "k", "t", "v")
  }

  private def rightDf: DataFrame = {
    val s = spark; import s.implicits._
    Seq(("a", ts(10), 1.1), ("a", ts(15), 2.2), ("a", ts(25), 3.3),
        ("b", ts(29), 4.4)).toDF("k", "t", "rv")
  }

  test("asofJoin: backward inclusive, per-key, left-outer — matches the direct definition") {
    val got = Temporal.asofJoin(leftDf, rightDf, "k", "t", "t", Seq("rv"))
      .orderBy("event_id")
      .select("event_id", "k", "v", "asof_t", "asof_rv").collect()
    val exp = Seq(
      Row(1L, "a", 10.0, null, null),
      Row(2L, "a", 20.0, ts(10), 1.1), // tie: right row at equal time IS visible
      Row(3L, "a", 30.0, ts(15), 2.2),
      Row(4L, "b", 40.0, ts(29), 4.4),
      Row(5L, "c", 50.0, null, null))
    assert(got.toSeq == exp)
  }

  test("asofJoin: every left row appears exactly once, all left columns survive") {
    val out = Temporal.asofJoin(leftDf, rightDf, "k", "t", "t", Seq("rv"))
    assert(out.count() == leftDf.count())
    assert(out.columns.toSeq == Seq("event_id", "k", "t", "v", "asof_t", "asof_rv"))
  }

  test("asofJoin plans a window over one sort — no join operator, no BNLJ") {
    val p = Temporal.asofJoin(leftDf, rightDf, "k", "t", "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"expected a window, got:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"as-of must not plan any join operator:\n$p")
  }

  // -------------------------------------------------------------- rangeJoin

  test("rangeJoin: equals the brute-force BETWEEN across bin widths (boundary + multi-bin spans)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, rnd.between(-500L, 500L))).toDF("p_id", "p")
    val ivs = (1 to 60).map { i =>
      val st = rnd.between(-500L, 450L); (i.toLong, st, st + rnd.between(0L, 120L))
    }.toDF("iv_id", "s", "e")
    val exp = points.as[(Long, Long)].collect().flatMap { case (pid, p) =>
      ivs.as[(Long, Long, Long)].collect().collect {
        case (ivid, st, en) if p >= st && p <= en => (pid, ivid)
      }
    }.toSet
    for (bw <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Temporal.rangeJoin(points, ivs, "p", "s", "e", bw)
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got == exp, s"binWidth=$bw: ${got.size} pairs vs expected ${exp.size}")
    }
  }

  test("rangeJoin: both bounds inclusive; each pair produced exactly once") {
    val s = spark; import s.implicits._
    val points = Seq((1L, 100L), (2L, 160L), (3L, 99L), (4L, 161L)).toDF("p_id", "p")
    val ivs = Seq((9L, 100L, 160L)).toDF("iv_id", "s", "e") // spans 2+ bins at bw=50
    val got = Temporal.rangeJoin(points, ivs, "p", "s", "e", 50L)
      .select("p_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L)) // 100 and 160 in; 99 and 161 out; no dups
  }

  test("rangeJoin plans an equi-join on the bin — never BNLJ/cartesian") {
    val s = spark; import s.implicits._
    val points = (1 to 100).map(i => (i.toLong, i * 10L)).toDF("p_id", "p")
    val ivs = (1 to 100).map(i => (i.toLong, i * 9L, i * 9L + 30L)).toDF("iv_id", "s", "e")
    val p = Temporal.rangeJoin(points, ivs, "p", "s", "e", 16L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must reduce to an equi-join:\n$p")
  }

  // ---------------------------------------------------------- bloomAntiJoin

  test("bloomAntiJoin ≡ plain left-anti join (exactness: bloom is pruning only)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val seen  = (1 to 3000).map(_ => rnd.nextInt(4000).toLong).toDF("key")
    val batch = (1 to 3000).map(i => (i.toLong, rnd.nextInt(8000).toLong)).toDF("id", "key")
    val exp = batch.join(seen, Seq("key"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    // tiny sketch forces real false positives through the residual re-check
    val got = Incremental.bloomAntiJoin(batch, seen, "key",
        expectedItems = 64L, fpp = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == exp)
    // each surviving row appears exactly once (the two branches are disjoint)
    assert(got.distinct.size == got.size)
  }

  test("bloomAntiJoin plan carries the bloom: might_contain filter + subquery build") {
    val s = spark; import s.implicits._
    val seen  = (1 to 100).map(_.toLong).toDF("key")
    val batch = (50 to 150).map(i => (i.toLong, i.toLong)).toDF("id", "key")
    val p = Incremental.bloomAntiJoin(batch, seen, "key")
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom filter must appear in the plan:\n$p")
    assert(p.contains("Subquery") || p.contains("subquery"),
      s"bloom build must be a scalar subquery:\n$p")
    assert(p.contains("LeftAnti"), s"residual must be an anti-join:\n$p")
  }

  test("crawlDiff: added/removed/changed/unchanged partition the key union") {
    val s = spark; import s.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("url", "text")
    val curr = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("url", "text")
    val got = Incremental.crawlDiff(prev, curr, "url", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    // the join's output schema carries only (key, hash, hash) — the
    // payload column is projected away below the exchange by construction
    val joined = Incremental.crawlDiff(prev, curr, "url", "text")
    assert(!joined.queryExecution.analyzed.toString.contains("text#") ||
      joined.columns.toSeq == Seq("url", "status"))
  }

  test("upsertLatest: newer wins, ts tie goes to updates, stale update loses") {
    val s = spark; import s.implicits._
    val base = Seq((1L, 10L, "b1"), (2L, 10L, "b2"), (3L, 10L, "b3"),
      (4L, 10L, "b4")).toDF("url", "ts", "text")
    val upd = Seq((1L, 20L, "u1"), (2L, 10L, "u2"), (3L, 5L, "u3"),
      (5L, 1L, "u5")).toDF("url", "ts", "text")
    val got = Incremental.upsertLatest(base, upd, "url", "ts")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> ((20L, "u1")), // newer update wins
      2L -> ((10L, "u2")), // ts tie: updates side wins
      3L -> ((10L, "b3")), // stale update loses
      4L -> ((10L, "b4")), // untouched base row survives
      5L -> ((1L, "u5")))) // brand-new key inserts
    assert(Incremental.upsertLatest(base, upd, "url", "ts").columns.toSeq ==
      Seq("url", "ts", "text"))
  }

  test("upsertLatest plans one hash aggregate with a map-side partial — no window, no join") {
    val s = spark; import s.implicits._
    val base = Seq((1L, 10L, "a")).toDF("url", "ts", "text")
    val plan = Incremental.upsertLatest(base, base, "url", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"), plan)
  }

  test("upsertLatest rejects mismatched schemas") {
    val s = spark; import s.implicits._
    val a = Seq((1L, 1L, "x")).toDF("url", "ts", "text")
    val b = Seq((1L, 1L)).toDF("url", "ts")
    intercept[IllegalArgumentException](Incremental.upsertLatest(a, b, "url", "ts"))
  }

  test("bloomAntiJoin argument guards") {
    val s = spark; import s.implicits._
    val d = Seq(1L).toDF("key")
    intercept[IllegalArgumentException](Incremental.bloomAntiJoin(d, d, "key", expectedItems = 0))
    intercept[IllegalArgumentException](Incremental.bloomAntiJoin(d, d, "key", fpp = 1.0))
    intercept[IllegalArgumentException](Temporal.rangeJoin(d, d, "key", "key", "key", 0L))
    intercept[IllegalArgumentException](Temporal.asofJoin(d, d, "key", "key", "key", Nil))
  }
}
