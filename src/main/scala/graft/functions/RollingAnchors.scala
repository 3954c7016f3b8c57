package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_anchors(text, n, modulus)` — the sampled positions of a
  * winnowing-style content-defined anchor scheme (Schleimer et al.
  * SIGMOD'03; the triage stage of exact-substring dedup à la Lee et al.
  * 2022): one row (pos, h) for every char-n-gram whose rolling polynomial
  * hash satisfies h % modulus == 0.
  *
  * The hash is EXACTLY RollingFingerprint's (same B=257, P=1e9+7, code
  * points, m=min(n,len), max(len-n+1,1) grams — the degenerate short-doc
  * gram included), so the DuckDB oracle reuses the same precomputed
  * B^k-mod-P constants, and anchors are comparable with fingerprints.
  *
  * Content-defined sampling is the point: because selection depends only
  * on the LOCAL n chars, the same substring is sampled at the same
  * relative offsets in every document containing it — so two documents
  * sharing any ≥n-char run share anchor hashes, and a plain groupBy h
  * finds cross-document boilerplate WITHOUT comparing documents pairwise.
  * Expected output density is 1/modulus of positions: the scan emits
  * corpus_chars/modulus rows, the only shuffle downstream is on h.
  */
case class RollingAnchorsGenerator(text: Expression, n: Int, modulus: Int,
                                   b: Long = 257L, p: Long = 1000000007L)
    extends Expression with Generator with CodegenFallback {

  require(n >= 1, s"rolling_anchors: n must be >= 1, got $n")
  require(modulus >= 1, s"rolling_anchors: modulus must be >= 1, got $modulus")

  override def children: Seq[Expression] = Seq(text)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_anchors expects a string column, got ${text.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false), // 1-based gram start
    StructField("h", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val cps = t.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    val m = math.min(n, len)
    val count = math.max(len - n + 1, 1)
    var bPow = 1L
    var k = 1
    while (k < m) { bPow = bPow * b % p; k += 1 }
    var h = 0L
    var j = 0
    while (j < m) { h = (h * b + cps(j)) % p; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    if (h % modulus == 0) out += InternalRow(1, h)
    var i = 1
    while (i < count) {
      var t0 = (h - cps(i - 1) % p * bPow % p) % p
      if (t0 < 0) t0 += p
      h = (t0 * b + cps(i + m - 1)) % p
      if (h % modulus == 0) out += InternalRow(i + 1, h)
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RollingAnchorsGenerator =
    copy(text = newChildren(0))
}

/** `cdc_chunks(text, n, modulus)` — content-defined chunking over the SAME
  * anchor scheme as [[RollingAnchorsGenerator]]: chunk boundaries at every
  * anchor position > 1 (a gram start whose rolling hash ≡ 0 mod modulus),
  * one row (idx, chunk) per chunk, covering the text exactly (first chunk
  * starts at 1, last runs to the end; empty text emits nothing).
  *
  * Because boundaries depend only on the local n chars, a substring shared
  * by two documents chunks IDENTICALLY in both past its first boundary —
  * so corpus-wide duplicated-span measurement reduces to exact dedup of
  * chunk hashes: the storage-dedup CDC idea applied as the scalable
  * approximation of exact-substring dedup (no suffix array, no pairwise
  * comparison). Expected chunk length is `modulus` chars + the n-gram tail.
  */
case class CdcChunksGenerator(text: Expression, n: Int, modulus: Int,
                              b: Long = 257L, p: Long = 1000000007L)
    extends Expression with Generator with CodegenFallback {

  require(n >= 1, s"cdc_chunks: n must be >= 1, got $n")
  require(modulus >= 1, s"cdc_chunks: modulus must be >= 1, got $modulus")

  override def children: Seq[Expression] = Seq(text)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a string column, got ${text.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false), // 1-based chunk index
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val cps = t.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    if (len == 0) return Nil
    val m = math.min(n, len)
    val count = math.max(len - n + 1, 1)
    var bPow = 1L
    var k = 1
    while (k < m) { bPow = bPow * b % p; k += 1 }
    var h = 0L
    var j = 0
    while (j < m) { h = (h * b + cps(j)) % p; j += 1 }
    val starts = scala.collection.mutable.ArrayBuffer(1)
    var i = 1
    while (i < count) { // pos 1 is always a start; anchors at 1 add nothing
      var t0 = (h - cps(i - 1) % p * bPow % p) % p
      if (t0 < 0) t0 += p
      h = (t0 * b + cps(i + m - 1)) % p
      if (h % modulus == 0) starts += i + 1
      i += 1
    }
    val out = new Array[InternalRow](starts.length)
    var c = 0
    while (c < starts.length) {
      val s = starts(c)
      val e = if (c + 1 < starts.length) starts(c + 1) else len + 1
      out(c) = InternalRow(c + 1,
        UTF8String.fromString(new String(cps, s - 1, e - s)))
      c += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CdcChunksGenerator =
    copy(text = newChildren(0))
}

object RollingAnchorsGenerator {
  /** Register `rolling_anchors(text, n, modulus)` as a session temp function. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_anchors",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "rolling_anchors(text, n, modulus)")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"rolling_anchors: $what must be an integer literal, got $other")
        }
        RollingAnchorsGenerator(exprs.head,
          intLit(exprs(1), "n"), intLit(exprs(2), "modulus"))
      },
      "built-in")
}
