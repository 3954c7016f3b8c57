package graft.functions

import graft.core.Rx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `py_findall(text, pattern)` — a custom Catalyst Expression exposing
  * Python `re.findall` semantics (Unicode classes, IGNORECASE folding, and
  * the one-capture-group-returns-the-group quirk the reference's phone
  * entity depends on, /root/reference/extractor/parsers/standard.py:14,33)
  * to SQL and the Column API. Built-in `regexp_extract_all` cannot express
  * the group quirk ('' for a non-participating group vs a full match).
  *
  * Codegen-native: `doGenCode` emits a static call into the cached-pattern
  * matcher, so the expression lives INSIDE WholeStageCodegen spans rather
  * than forcing the interpreted fallback path for the whole projection —
  * surrounding expressions stay fused. Compiled patterns are cached
  * process-wide (graft.core.Rx), so each row pays only the match.
  */
case class PyFindAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_findall expects (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "py_findall"

  override protected def nullSafeEval(text: Any, pattern: Any): Any =
    PyFindAll.findallData(text.asInstanceOf[UTF8String], pattern.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.functions.PyFindAll$$.MODULE$$.findallData($t, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PyFindAll =
    copy(left = newLeft, right = newRight)
}

object PyFindAll {

  /** Shared by interpreted eval and generated code (called via the static
    * module reference from janino-compiled projections).
    */
  def findallData(text: UTF8String, pattern: UTF8String): GenericArrayData = {
    val rx = Rx(pattern.toString) // cached compile
    new GenericArrayData(rx.findall(text.toString).map(UTF8String.fromString).toArray[Any])
  }
  /** Register `py_findall` as a session temp function (SQL-callable). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "py_findall",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "py_findall(text, pattern)")
        PyFindAll(exprs.head, exprs(1))
      },
      "built-in")
}
