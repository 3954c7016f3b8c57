package graft.plans

import graft.pipeline.Extract

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The extraction operator as a first-class Catalyst citizen (SURVEY §7.4's
  * remaining stretch): a custom `LogicalPlan` node + `SparkStrategy` +
  * physical `SparkPlan`, registered through `SparkSessionExtensions`
  * (pattern: public SparkSessionExtensions examples, SNIPPETS.md [1]).
  *
  * `ExtractPages(child, mode)` consumes a child relation carrying
  * (url STRING, html BINARY, text STRING) — the BASELINE.json input_hint
  * payload columns — and produces one extraction row per url via the same
  * parse core as the Dataset pipeline. Because the node declares exactly
  * those three references, Catalyst column-prunes the child scan down to
  * them regardless of how wide the pages table is, and pushes any child
  * filters below the node — optimizations the closed `mapPartitions`
  * formulation gets only from the typed pipeline's explicit select.
  */
case class ExtractPages(
    child: LogicalPlan, mode: String,
    // output lives in the constructor so plan copies (withNewChildInternal
    // during optimizer rewrites) keep STABLE expression ids — regenerating
    // attributes per instance breaks parent references at binding time
    override val output: Seq[Attribute] = ExtractPages.freshOutput()) extends UnaryNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override def references: AttributeSet =
    AttributeSet(child.output.filter(a => ExtractPages.inputCols(a.name)))
  override protected def withNewChildInternal(newChild: LogicalPlan): ExtractPages =
    copy(child = newChild)
}

object ExtractPages {
  private[plans] val inputCols = Set("url", "html", "text")

  def freshOutput(): Seq[Attribute] = outputSchema.map(f =>
    AttributeReference(f.name, f.dataType, f.nullable)())

  val outputSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("payload_kind", StringType, nullable = false),
    StructField("n_pages", IntegerType, nullable = false),
    StructField("extracted_text", StringType, nullable = false),
    StructField("extracted_json", StringType, nullable = true),
    StructField("bytes_in", LongType, nullable = false),
    StructField("chars_out", LongType, nullable = false),
    StructField("needs_ocr", BooleanType, nullable = false),
    StructField("error", StringType, nullable = true)))

  /** Column-API entry: wrap a pages DataFrame in the logical node. The
    * session must have the strategy registered ([[GraftExtensions]] via
    * spark.sql.extensions, or [[register]] on a live session).
    */
  def extract(pages: DataFrame, mode: String = "construction"): DataFrame =
    GraftBridge.ofRows(pages.sparkSession, ExtractPages(pages.queryExecution.logical, mode))

  /** Register the planner strategy on a live session (tests / REPL). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(ExtractPagesStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ ExtractPagesStrategy
}

/** Plans the logical node to the physical exec. */
object ExtractPagesStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ExtractPages(child, mode, out) =>
      graft.plans.ExtractPagesExec(planLater(child), mode, out) :: Nil
    case _ => Nil
  }
}

/** Physical operator: one narrow pass over the child's partitions through
  * the parse core — no shuffle introduced (partitioning/skew policy stays
  * with the surrounding plan, e.g. the pipeline's salted repartition).
  */
case class ExtractPagesExec(child: SparkPlan, mode: String,
                            override val output: Seq[Attribute]) extends UnaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    def idx(name: String): Int = childOut.indexWhere(_.name == name)
    val (ui, hi, ti) = (idx("url"), idx("html"), idx("text"))
    require(ui >= 0 && hi >= 0 && ti >= 0,
      s"ExtractPages child must provide url/html/text, got ${childOut.map(_.name)}")
    val m = mode
    val out = output
    child.execute().mapPartitions({ it =>
      val proj = UnsafeProjection.create(out.map(_.dataType).toArray)
      it.map { row =>
        val url = row.getUTF8String(ui).toString
        val html = if (row.isNullAt(hi)) null else row.getBinary(hi)
        val text = if (row.isNullAt(ti)) null else row.getUTF8String(ti).toString
        val r = Extract.parseRow(url, html, text, 0, m)
        proj(InternalRow(
          UTF8String.fromString(r.url),
          UTF8String.fromString(r.payload_kind),
          r.n_pages,
          UTF8String.fromString(r.extracted_text),
          if (r.extracted_json == null) null else UTF8String.fromString(r.extracted_json),
          r.bytes_in,
          r.chars_out,
          r.needs_ocr,
          if (r.error == null) null else UTF8String.fromString(r.error)))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): ExtractPagesExec =
    copy(child = newChild)
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — injects the
  * strategy at session build time, the deployment-grade registration path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => ExtractPagesStrategy)
    ext.injectOptimizerRule(_ => TopKWindowRewrite)
  }
}
