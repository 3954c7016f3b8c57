package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gram_stats(text, n)` → struct(n_grams, n_distinct, top_cov): the
  * per-document word-n-gram repetition profile of Gopher's quality filters
  * (Rae et al. 2021, §A1.1 — "duplicate n-gram fraction" and "fraction of
  * characters in the most frequent n-gram"), computed in ONE pass per row.
  *
  *   - n_grams    : total word n-gram occurrences = max(tokens - n + 1, 0)
  *   - n_distinct : distinct n-gram strings (true string equality, not a
  *                  hash residue — the count is exact by construction)
  *   - top_cov    : max over distinct grams of count(gram) · charlen(gram),
  *                  the character coverage of the most repetitive n-gram
  *                  (charlen in CODE POINTS, matching SQL `length`)
  *
  * Downstream: dup_frac = (n_grams - n_distinct) / n_grams and
  * top_frac = top_cov / length(text) are plain Column arithmetic.
  *
  * Tokenization is `split(text, " ")` — single-space separator, empty
  * tokens kept — so every gram is a contiguous byte slice of the input
  * (the WordShinglesGenerator observation: 0x20 never occurs inside a
  * multi-byte UTF-8 sequence). Grams are zero-copy UTF8String views; the
  * count map is one small HashMap per row.
  *
  * This is scan-side: no explode, no shuffle. The equivalent relational
  * formulation (explode grams → groupBy(doc, gram) → groupBy(doc)) pays a
  * full shuffle of every gram occurrence — at web scale that is ~n× the
  * corpus bytes through the exchange, for a per-document statistic that
  * never needed cross-row state.
  */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram_stats: n must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_cov", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_stats expects string, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GramStats.compute(v.asInstanceOf[UTF8String], n)
  }

  /** Static-call codegen (the RollingFingerprint pattern): stays inside
    * whole-stage codegen; the kernel is one JIT-compiled method shared by
    * every query instead of Janino-inlined source per plan.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramStats.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {
  /** Shared interpreted/generated kernel. */
  def compute(v: UTF8String, n: Int): InternalRow = {
    val bytes = v.getBytes
    val len = bytes.length
    // token starts: 0 and every position after a 0x20 byte (split(" ")
    // semantics: "" → one empty token, "a  b" → ["a","","b"])
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nTokens += 1; i += 1 }
    val total = nTokens - n + 1
    if (total <= 0) return InternalRow(0L, 0L, 0L)
    val starts = new Array[Int](nTokens)
    var ti = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(ti) = i + 1; ti += 1 }
      i += 1
    }
    // exact counts by true gram equality: UTF8String.equals is byte
    // equality, so a count can never be folded across distinct grams the
    // way a hash-residue table could (the oracle recomputes string-exact
    // counts — the kernel must too)
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var p = 0
    while (p < total) {
      val from = starts(p)
      val until = if (p + n < nTokens) starts(p + n) - 1 else len
      val gram = UTF8String.fromBytes(bytes, from, until - from)
      val c = counts.get(gram)
      if (c == null) counts.put(gram, Array(1)) else c(0) += 1
      p += 1
    }
    var topCov = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cov = e.getValue()(0).toLong * e.getKey.numChars()
      if (cov > topCov) topCov = cov
    }
    InternalRow(total.toLong, counts.size.toLong, topCov)
  }

  /** Register `gram_stats(text, n)` as a session temp function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_stats",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "gram_stats(text, n)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"gram_stats: n must be an integer literal, got $other")
        }
        GramStats(exprs.head, n)
      },
      "built-in")
}
