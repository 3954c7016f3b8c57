package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Incremental-crawl dedup: of a new `batch`, keep only rows whose key was
  * never seen in the accumulated `seen` set — EXACT anti-join semantics,
  * with a Bloom filter as a pure pruning layer (false positives re-checked,
  * false negatives impossible), the way Spark's own InjectRuntimeFilter
  * prunes shuffle-join probe sides.
  */
object Incremental {

  /** Exact `batch ⟕̸ seen` (left anti on `key`), bloom-accelerated.
    *
    * Shape: ONE pass over `seen` builds a Bloom sketch of xxhash64(key)
    * — expressed as a scalar subquery (`BloomFilterAggregate`), so it is
    * lazy, shows up in the plan, and physical planning's ReuseSubquery
    * executes it once even though two filters reference it; nothing but
    * the constant-size sketch ever reaches the driver. Batch rows the
    * bloom rejects are DEFINITELY new and ship straight to the output
    * with no join at all; only bloom-positive rows (true dups + fpp of
    * the rest) enter the anti-join. For the mostly-new batches of a
    * rolling crawl this shrinks the join probe side from |batch| to
    * ≈|dups| + fpp·|batch| — the shuffle that dominated the naive
    * anti-join becomes a skim. The `seen` side of the residual join
    * still scans once; at 10^12-key scale keep `seen` bucketed on key
    * so the residual anti-join is exchange-free on that side.
    *
    * Keys must be non-null (a null key never equals anything under SQL
    * anti-join semantics anyway; filter them upstream).
    *
    * `expectedItems`/`fpp` size the sketch: numBits = -n·ln(p)/ln²2 —
    * 1e8 keys at 3% fpp is a ~91 MB broadcast-sized sketch.
    */
  def bloomAntiJoin(batch: DataFrame, seen: DataFrame, key: String,
                    expectedItems: Long = 4000000L,
                    fpp: Double = 0.03): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0,1)")
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong

    val bloomAgg = GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(xxhash64(col(key))),
        Literal(expectedItems), Literal(numBits)
      ).toAggregateExpression())
    val bloomPlan = GraftBridge.analyzedPlan(seen.select(bloomAgg.as("bf")))
    def might = GraftBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      GraftBridge.expression(xxhash64(col(key)))))

    val definitelyNew = batch.where(!might)
    val residual = batch.where(might)
      .join(seen.select(col(key)).distinct(), Seq(key), "left_anti")
    definitelyNew.unionByName(residual)
  }

  /** Latest-wins upsert (MERGE semantics for a rolling crawl): merge an
    * `updates` batch into `base` keeping, per `key`, the row with the
    * greatest `tsCol`; on ts ties the updates side wins (re-fetching a page
    * at the same timestamp replaces it), and any remaining tie breaks on
    * the payload's natural struct order so the result is a total order —
    * deterministic under any partitioning.
    *
    * Shape: ONE exchange on `key`, and crucially max-of-struct is an
    * ALGEBRAIC aggregate — the partial max runs map-side, so a dup-heavy
    * recrawl collapses before the shuffle. The window-rank formulation of
    * the same merge (`row_number over (partition by key order by ts desc)`)
    * shuffles EVERY row and then sorts; this shuffles one survivor
    * candidate per (key, input partition). Both frames must share a
    * schema; columns keep their `base` order.
    */
  def upsertLatest(base: DataFrame, updates: DataFrame, key: String,
                   tsCol: String): DataFrame = {
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schema mismatch: ${base.columns.toSeq} vs ${updates.columns.toSeq}")
    val payload = base.columns.filter(c => c != key && c != tsCol).toSeq
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val winner = max(struct(
      (col(tsCol) +: col("__src") +: payload.map(c => col(s"`$c`"))): _*))
    val outCols = base.columns.toSeq.map(c =>
      if (c == key) col(key) else col(s"__w.`$c`").as(c))
    tagged.groupBy(col(key)).agg(winner.as("__w")).select(outCols: _*)
  }

  /** Crawl delta between two snapshots: one full-outer join on `key`,
    * status ∈ {added, removed, changed, unchanged} — the report a rolling
    * crawl reads before deciding what to re-extract. Contents compare by
    * md5, computed scan-side BEFORE the join, so wide payloads never ship
    * through the exchange — the shuffle carries (key, 32-char hash). One
    * shuffle on the key; zero with both snapshots bucketed on it.
    */
  def crawlDiff(prev: DataFrame, curr: DataFrame, key: String,
                contentCol: String): DataFrame = {
    val p = prev.select(col(key), md5(col(contentCol).cast("binary")).as("__hp"))
    val c = curr.select(col(key), md5(col(contentCol).cast("binary")).as("__hc"))
    p.join(c, Seq(key), "full_outer")
      .select(col(key),
        when(col("__hp").isNull, "added")
          .when(col("__hc").isNull, "removed")
          .when(col("__hp") === col("__hc"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
