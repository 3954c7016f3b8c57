package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns — the hot inner
  * loop of every similarity operator (graft.ops.VectorSim scores quantized
  * vectors with it: pairs × dims evaluations).
  *
  * The higher-order-function formulation `aggregate(zip_with(a, b, _*_),
  * 0L, _+_)` is interpreted (HOF expressions have no codegen) and
  * allocates a 64-element array per evaluation; at 2M candidate pairs that
  * measured 148 s for one query. This expression generates a bare
  * `long` loop inside WholeStageCodegen — no allocation, no lambda
  * dispatch.
  */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_long expects (array<bigint>, array<bigint>), got ($l, $r)")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Fail LOUDLY on mismatched lengths: silently truncating to the shorter
    // array (the earlier behavior) turns a malformed/mismatched embedding
    // into a plausible-but-wrong score; the HOF formulation this replaced
    // at least surfaced a visible NULL. A hard error is the only variant
    // that cannot be silently consumed by a downstream threshold.
    if (n != y.numElements()) throw DotLong.mismatch(n, y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.DotLong.mismatch($n, $b.numElements());
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  /** Shared by interpreted eval and generated code (the codegen template
    * calls it by its JVM name — keep it a plain static-forwardable method).
    */
  def mismatch(nLeft: Int, nRight: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"dot_long: vector length mismatch ($nLeft vs $nRight); " +
        "embeddings scored together must share one dimension")
}
