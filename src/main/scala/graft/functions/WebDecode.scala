package graft.functions

import graft.core.CharsetDetect

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `charset_of(bin)` — detected charset of a raw crawl payload as a native
  * Catalyst expression over [[graft.core.CharsetDetect]]: BOM → strict
  * whole-payload UTF-8 validation → WHATWG-normalized `charset=` meta
  * label → windows-1252 fallback. Scan-side scalar, zero exchange, stays
  * inside WholeStageCodegen (shared interpreted/generated kernel like the
  * repo's other native expressions).
  */
case class CharsetOf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_of expects binary, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else CharsetOf.compute(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharsetOf.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharsetOf =
    copy(child = newChild)

  override def prettyName: String = "charset_of"
}

object CharsetOf {
  /** Shared interpreted/generated kernel. */
  def compute(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(CharsetDetect.detect(bytes).charset)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "charset_of",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "charset_of(bin)")
        CharsetOf(exprs.head)
      },
      "built-in")
}

/** `decode_web(bin)` — charset-detected decoding of raw crawl bytes to
  * text: the step between the WARC payload and every downstream text
  * operator. UTF-8 (BOM stripped) for valid payloads, the declared
  * charset for labeled legacy ones, WHATWG windows-1252 (hand-rolled
  * fixed table — no JVM charset-provider variance) as the fallback, so
  * mislabeled-but-valid UTF-8 never turns into mojibake.
  */
case class DecodeWeb(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_web expects binary, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else DecodeWeb.compute(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DecodeWeb.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DecodeWeb =
    copy(child = newChild)

  override def prettyName: String = "decode_web"
}

object DecodeWeb {
  /** Shared interpreted/generated kernel. */
  def compute(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(CharsetDetect.decode(bytes))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decode_web",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "decode_web(bin)")
        DecodeWeb(exprs.head)
      },
      "built-in")
}
