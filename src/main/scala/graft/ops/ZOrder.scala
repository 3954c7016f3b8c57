package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-column answer to "sort
  * by which key?" at 100 TB. A table sorted by one column prunes scans on
  * that column only; interleaving the bits of k quantized columns gives
  * every one of them locality, so parquet row-group min/max statistics
  * prune predicates on ANY of the interleaved columns (the same layout
  * Iceberg's rewrite-with-zorder produces).
  *
  * Everything is integer Column arithmetic (shifts/and/or — codegen'd, no
  * UDF), so the z-value is bit-reproducible cross-engine and oracle-able
  * like every other contract here.
  */
object ZOrder {

  /** Morton z-value of k columns, each pre-quantized to [0, 2^bits).
    * Column i's bit b lands at interleaved position b·k + i. Values are
    * masked to `bits` (out-of-range inputs wrap rather than corrupting
    * neighbours' lanes). k·bits must fit a non-negative BIGINT.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*k must fit a BIGINT sign-free: ${bits}*${cols.size}")
    val k = cols.size
    cols.zipWithIndex.map { case (c0, i) =>
      val c = c0.cast("long")
      (0 until bits).map { b =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered on `cols` into `files` range partitions: range
    * partition + in-partition sort by the z-value, so file f holds a
    * contiguous z-range and every interleaved column's min/max per file is
    * tight. One range exchange — the price of ANY clustered layout.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  files: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(cols.map(col), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
