package graft.functions

import graft.core.Rx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * Interpreted (CodegenFallback): the regex itself dominates cost and
  * compiled patterns are cached process-wide (graft.core.Rx), so each row
  * pays only the match. A `doGenCode` version is a known follow-up; the
  * expression still composes inside Catalyst plans (filters push around
  * it, columns prune through it).
  */
case class PyFindAll(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_findall expects (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "py_findall"

  override protected def nullSafeEval(text: Any, pattern: Any): Any = {
    val rx = Rx(pattern.asInstanceOf[UTF8String].toString) // cached compile
    val found = rx.findall(text.asInstanceOf[UTF8String].toString)
    new GenericArrayData(found.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PyFindAll =
    copy(left = newLeft, right = newRight)
}

object PyFindAll {
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
