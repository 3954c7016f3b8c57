package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's optimizer has no native operator for — each
  * re-expressed as a shape Catalyst CAN plan well (one partitioned
  * sort, or one equi-join), instead of the BroadcastNestedLoopJoin a
  * naive inequality-join formulation degenerates to.
  *
  * No reference counterpart (the reference is a per-document extractor);
  * these are the event-table analytics companions of the corpus ops, in
  * the lineage of Pandas `merge_asof` and the Databricks range-join
  * optimization (both public APIs; implementations here are from
  * scratch).
  */
object Temporal {

  /** Backward inclusive as-of join: each left row picks the LATEST right
    * row of the same key with `right.timeCol <= left.timeCol` (ties at
    * equal time: the right row IS visible). Output = every left column,
    * plus `asof_<rightTime>` and `asof_<v>` for each requested right
    * value column — all null when no prior right row exists (left-outer
    * semantics, like DuckDB `ASOF LEFT JOIN` / Pandas `merge_asof`).
    *
    * Shape: the classic union sort-merge — tag sides, union, ONE
    * shuffle+sort on (key, time, side), and a running
    * `last(_, ignoreNulls)` window carries the most recent right payload
    * forward into each left row. No join operator at all, so there is no
    * per-left-row right-side scan and no BNLJ: cost is exactly one sort
    * of |L|+|R| rows. At cluster scale a hot key serializes into one
    * task — inherent to per-key ordering (same bound as sessionization);
    * the window is rows-bounded so state is O(1) per row, not O(n).
    *
    * Caller contract: right rows are unique per (key, time) — pre-reduce
    * if not, or the tie among equal right rows is sort-nondeterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one right column")
    val leftRow  = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightRow = struct(
      (col(rightTime).as(s"asof_$rightTime") +:
        rightVals.map(c => col(c).as(s"asof_$c"))).toIndexedSeq: _*)
    val lt = left.select(leftRow.as("__l")).schema.head.dataType
    val rt = right.select(rightRow.as("__r")).schema.head.dataType

    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), lit(null).cast(rt).as("__r"), leftRow.as("__l"))
    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), rightRow.as("__r"), lit(null).cast(lt).as("__l"))

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*"), col("__last.*"))
  }

  /** Interval containment join: every (point, interval) pair with
    * `start <= point <= end`, both bounds inclusive. `pointCol`, `startCol`
    * and `endCol` are integral (epoch millis/seconds — cast timestamps
    * with `unix_millis` first; integral bin arithmetic is exact).
    *
    * Spark plans a raw BETWEEN theta-join as BroadcastNestedLoopJoin —
    * O(|P|·|I|) compares and a broadcast bound. This is the bin-bucketed
    * reformulation (the public Databricks range-join optimization,
    * rebuilt): each interval explodes into the `ceil(len/binWidth)+1`
    * bins it overlaps (a codegen'd `sequence`+`explode`, no UDF), each
    * point maps to its single bin, and the pair generation is a plain
    * shuffled EQUI-join on bin followed by the exact BETWEEN filter.
    * Each qualifying pair meets in exactly one bin (the point's), so no
    * dedup pass is needed. A time bucket where many intervals stack is
    * an ordinary hot shuffle key — AQE skew-split applies, which is the
    * whole point of reducing to an equi-join.
    *
    * Pick `binWidth` near the median interval length: larger bins cut
    * the interval replication factor, smaller bins cut per-bin fanout.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, startCol: String, endCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ivBins = intervals
      .withColumn("__bin", explode(sequence(
        floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    points.withColumn("__bin", floor(col(pointCol) / binWidth))
      .join(ivBins, "__bin")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
