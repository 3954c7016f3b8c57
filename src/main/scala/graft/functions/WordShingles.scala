package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — distinct word n-gram shingles of a
  * single-space-tokenized text, emitted one row per shingle (first-occurrence
  * order, matching `array_distinct` over the HOF formulation it replaces —
  * see graft.ops.TextDedup.shingles).
  *
  * Two observations make this a near-zero-allocation generator:
  *   1. Tokenization is `split(text, " ")` (single-char separator, empty
  *      tokens kept — Spark and Python agree), and grams re-join tokens with
  *      the SAME separator — so every shingle is an exact contiguous
  *      substring of the input: text[start(i) .. end(i+n-1)]. No token
  *      array, no per-gram concat: just byte-offset slices.
  *   2. 0x20 never appears inside a multi-byte UTF-8 sequence (continuation
  *      bytes are ≥ 0x80), so token boundaries come from a single byte scan.
  *
  * Each emitted shingle is a zero-copy `UTF8String.fromBytes(base, off, len)`
  * view over one shared byte array per input row. The interpreted-HOF
  * formulation this replaces (transform ∘ sequence ∘ concat_ws ∘ element_at,
  * then array_distinct, then explode) evaluated its lambda tree per (gram ×
  * position) with no codegen and no CSE — the round-2 profiling showed that
  * tree dominating the minhash/jaccard operators' cost.
  *
  * Interpreted as a generator (CodegenFallback) like ExtractItemsGenerator:
  * one eval per row, tight JVM loop inside; Catalyst plans it natively via
  * GenerateExec (column pruning and filter pushdown still apply).
  */
case class WordShinglesGenerator(text: Expression, n: Int)
    extends Expression with Generator with CodegenFallback {

  require(n >= 1, s"word_shingles: n must be >= 1, got $n")

  override def children: Seq[Expression] = Seq(text)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got ${text.dataType}")

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val bytes = t.asInstanceOf[UTF8String].getBytes // one copy per row
    val len = bytes.length
    // token start offsets: 0 and every position after a 0x20 byte.
    // split("", " ") = [""] — one empty token, matching Spark's split.
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nTokens += 1; i += 1 }
    if (nTokens < n) return Nil
    val starts = new Array[Int](nTokens)
    var ti = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(ti) = i + 1; ti += 1 }
      i += 1
    }
    val seen = new java.util.HashSet[UTF8String]()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var p = 0
    val last = nTokens - n
    while (p <= last) {
      // gram spans token p through token p+n-1: from starts(p) to the byte
      // before token p+n's separator (or end of text for the final gram)
      val from = starts(p)
      val until = if (p + n < nTokens) starts(p + n) - 1 else len
      val gram = UTF8String.fromBytes(bytes, from, until - from)
      if (seen.add(gram)) out += InternalRow(gram)
      p += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordShinglesGenerator =
    copy(text = newChildren(0))
}

object WordShinglesGenerator {
  /** Register `word_shingles(text, n)` as a session temp function. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "word_shingles(text, n)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles: n must be an integer literal, got $other")
        }
        WordShinglesGenerator(exprs.head, n)
      },
      "built-in")
}
