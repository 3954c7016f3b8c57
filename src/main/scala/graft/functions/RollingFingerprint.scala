package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_fingerprint(text)` → struct(fp_min, fp_max, n_grams): the
  * document fingerprint over character n-grams, computed with a polynomial
  * rolling hash in ONE pass per row — no gram explode, no shuffle, no
  * per-gram string allocation, no cryptographic hash.
  *
  * Hash of the gram at position i (1-based, code points):
  *   h(i) = Σ_{j=0..m-1} cp(i+j) · B^(m-1-j)  mod P
  * with m = min(n, len); docs shorter than n contribute exactly one gram
  * over their full text (len 0 → the empty gram hashes to 0), matching the
  * previous operator's `greatest(len - n + 1, 1)` shape. Evaluated by
  * Horner's rule left-to-right, O(1) amortized per gram.
  *
  * Cross-engine exactness: the hash is pure 64-bit modular arithmetic over
  * UNICODE CODE POINTS — DuckDB's `substr`/`length`/`unicode` are
  * code-point-based and BIGINT arithmetic is exact, so the oracle
  * recomputes bit-identical values with a precomputed B^k-mod-P constant
  * list (no floating-point `pow`). P = 1e9+7 keeps every intermediate
  * below 2^63 (h < P, h·B + cp < 1e9·257 + 2^21 « 2^63).
  *
  * The md5-per-gram variant (TextStats.fingerprintAgg) remains for
  * contracts that want a keyed-quality hash; this is the scan-side fast
  * path (measured ~9× cheaper at sf0.1).
  *
  * Semantics note: `n_grams` counts distinct hash RESIDUES mod P, not
  * distinct gram strings — expected undercount ≈ g²/2P per doc (≈1 at
  * ~65k grams), a size-dependent bias the 60-bit md5 variant does not
  * have. Fine as a dedup-triage signal; use fingerprintAgg when the exact
  * distinct-gram count matters.
  */
case class RollingFingerprint(child: Expression, n: Int = 8,
                              b: Long = 257L, p: Long = 1000000007L)
    extends UnaryExpression {

  require(n >= 1 && b > 1 && p > 1 && (p - 1) * b + 0x10FFFF > 0,
    "rolling_fingerprint: invalid parameters")

  override def dataType: DataType = StructType(Seq(
    StructField("fp_min", LongType, nullable = false),
    StructField("fp_max", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint expects string, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else RollingFingerprint.compute(v.asInstanceOf[UTF8String], n, b, p)
  }

  /** Codegen: a static call into the shared kernel (the StaticInvoke
    * pattern) — stays inside whole-stage codegen with no per-row virtual
    * `eval` dispatch or value boxing; parameters are baked as literals.
    * The kernel itself is a scalar loop the JIT compiles once, so inlining
    * its ~60 lines as Janino source would only duplicate it per query
    * (and push WSCG methods toward the 64KB limit) for zero gain.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingFingerprint.compute($c, $n, ${b}L, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  /** The shared interpreted/generated kernel. */
  def compute(v: UTF8String, n: Int, b: Long, p: Long): InternalRow = {
    val cps = v.toString.codePoints().toArray
    val len = cps.length
    val m = math.min(n, len)
    val count = math.max(len - n + 1, 1)
    // B^(m-1) mod P, for the rolling subtraction
    var bPow = 1L
    var k = 1
    while (k < m) { bPow = bPow * b % p; k += 1 }
    var h = 0L
    var j = 0
    while (j < m) { h = (h * b + cps(j)) % p; j += 1 } // Horner over gram 1
    var min = h
    var max = h
    // distinct count via open-addressing long set — a boxed
    // java.util.HashSet[Long] here dominated the whole operator (~40M
    // boxing allocations per 5k-doc batch, measured 4.3 s vs 0.8 s at
    // local[8]). Power-of-two table ≥ 2×grams; 0 is the empty slot
    // sentinel, the (legal) hash value 0 is tracked by a flag.
    // Long arithmetic: `cap < count * 2` in Int silently wraps for docs
    // with ≥ 2^30 grams, leaving a 4-slot table whose probe loop then
    // spins forever once 5 distinct hashes land. Refuse loudly instead —
    // a ≥2^28-gram single document (≥256 MB of text in ONE row) needs a
    // multi-GB probe table and should be chunked upstream, not hung on.
    require(count < (1 << 28),
      s"rolling_fingerprint: document has $count grams; split rows above 2^28 chars")
    var cap = 4
    while (cap.toLong < count.toLong * 2) cap <<= 1
    val table = new Array[Long](cap)
    var zeroSeen = false
    var distinct = 0
    def add(v: Long): Unit =
      if (v == 0L) { if (!zeroSeen) { zeroSeen = true; distinct += 1 } }
      else {
        var idx = ((v * 0x9E3779B97F4A7C15L) >>> 40).toInt & (cap - 1)
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & (cap - 1)
        if (table(idx) == 0L) { table(idx) = v; distinct += 1 }
      }
    add(h)
    var i = 1
    while (i < count) {
      // slide: drop cp(i-1), append cp(i+m-1)
      var t = (h - cps(i - 1) % p * bPow % p) % p
      if (t < 0) t += p
      h = (t * b + cps(i + m - 1)) % p
      if (h < min) min = h
      if (h > max) max = h
      add(h)
      i += 1
    }
    InternalRow(min, max, distinct.toLong)
  }

  /** The B^k mod P constant list the DuckDB oracle needs, largest exponent
    * use is B^(n-1); index k = exponent (0-based).
    */
  def powerConstants(n: Int, b: Long = 257L, p: Long = 1000000007L): Seq[Long] = {
    val out = Array.ofDim[Long](n)
    out(0) = 1L
    (1 until n).foreach(k => out(k) = out(k - 1) * b % p)
    out.toSeq
  }

  /** Register `rolling_fingerprint(text[, n])` as a session temp function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint",
      (exprs: Seq[Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 2, "rolling_fingerprint(text[, n])")
        val n = if (exprs.length == 2) exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"rolling_fingerprint: n must be an integer literal, got $other")
        } else 8
        RollingFingerprint(exprs.head, n)
      },
      "built-in")
}
