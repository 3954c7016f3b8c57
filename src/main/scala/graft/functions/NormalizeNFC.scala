package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `norm_nfc(text)` — Unicode NFC normalization as a native Catalyst
  * expression. Spark has no built-in normalizer (SPARK-38477 area), yet a
  * web-text pipeline MUST canonicalize before hashing: the same rendered
  * page arrives from different crawlers as composed ("é" U+00E9) or
  * decomposed ("e"+U+0301) bytes, and every dedup operator in this library
  * keys on byte-exact hashes — without NFC, trivially identical documents
  * never collide.
  *
  * NFC (not NFKC) on purpose: NFC is the W3C/WHATWG canonical form for web
  * content and is content-preserving; NFKC folds compatibility characters
  * (ﬁ → fi, ² → 2), a lossy choice a corpus pipeline should opt into
  * separately, not get by default.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that returns true
  * for (the overwhelmingly common) already-NFC text — ASCII short-circuits
  * immediately — and then the input UTF8String is returned as-is with zero
  * allocation. Only actually-denormalized rows pay the String round-trip.
  *
  * Cross-engine: DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm (utf8proc), so oracle parity is exact for assigned code
  * points.
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_nfc expects string, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else NormalizeNFC.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeNFC.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFC =
    copy(child = newChild)
}

object NormalizeNFC {
  import java.text.Normalizer

  /** Shared interpreted/generated kernel. */
  def compute(v: UTF8String): UTF8String = {
    val s = v.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) v
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** Register `norm_nfc(text)` as a session temp function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "norm_nfc",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "norm_nfc(text)")
        NormalizeNFC(exprs.head)
      },
      "built-in")
}
