package graft.functions

import graft.core.{Assemble, Construction, QInt, QStr}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `extract_items(text, page_num)` — the construction item fold (P2/P3/P4,
  * reference /root/reference/extractor/parsers/construction.py:153-214 +
  * the 434-line classifier) packaged as a custom Catalyst `Generator`, so
  * the UDTF-shaped operator (one text → N item rows, SURVEY.md §2.9)
  * composes in SQL exactly like `explode`:
  *
  *   SELECT doc_id, it.* FROM docs LATERAL VIEW extract_items(text, 1) it
  *
  * Items are emitted post-validation (Pydantic validator parity,
  * models/construction.py:62-102); the `quantity: int|str` union maps to
  * the (quantity_int, quantity_str) column pair per SURVEY §1.2 — exactly
  * one is non-null when a quantity exists.
  *
  * Interpreted (CodegenFallback) like every generator that wraps an
  * opaque core; Catalyst still plans it natively (GenerateExec), prunes
  * columns through it, and pushes filters around it.
  */
case class ExtractItemsGenerator(text: Expression, page: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, page)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType &&
        (page.dataType == LongType || page.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_items expects (string, int/bigint), got (${text.dataType}, ${page.dataType})")

  override def elementSchema: StructType = StructType(Seq(
    StructField("fixture_type", StringType),
    StructField("quantity_int", LongType),
    StructField("quantity_str", StringType),
    StructField("model_number", StringType),
    StructField("dimensions", StringType),
    StructField("mounting_type", StringType),
    StructField("spec_reference", StringType),
    StructField("page_number", LongType, nullable = false),
    StructField("line_number", LongType),
    StructField("raw_text", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val pageNum = page.eval(input) match {
      case null    => 1L
      case i: Int  => i.toLong
      case l: Long => l
      case other   => other.toString.toLong
    }
    def s(v: Option[String]): Any = v.map(UTF8String.fromString).orNull
    def l(v: Option[Long]): Any = v.map(java.lang.Long.valueOf).orNull
    Construction.extractItems(t.asInstanceOf[UTF8String].toString, pageNum)
      .map(Assemble.validateItem)
      .map { it =>
        val (qi, qs) = it.quantity match {
          case Some(QInt(v)) => (java.lang.Long.valueOf(v), null)
          case Some(QStr(v)) => (null, UTF8String.fromString(v))
          case None          => (null, null)
        }
        InternalRow(s(it.fixtureType), qi, qs, s(it.modelNumber),
          s(it.dimensions), s(it.mountingType), s(it.specReference),
          it.pageNumber, l(it.lineNumber), s(it.rawText))
      }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExtractItemsGenerator =
    copy(text = newChildren(0), page = newChildren(1))
}

object ExtractItemsGenerator {
  /** Register `extract_items` as a session temp function (SQL-callable). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_items",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "extract_items(text, page_num)")
        ExtractItemsGenerator(exprs.head, exprs(1))
      },
      "built-in")
}
