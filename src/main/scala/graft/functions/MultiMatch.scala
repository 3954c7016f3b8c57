package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `multi_match(text, patterns...)` → array<long>: per-pattern counts of
  * ALL substring occurrences (overlapping included) in one pass over the
  * text, via an Aho–Corasick automaton (Aho & Corasick, CACM 1975) built
  * once per query and shared by every row.
  *
  * This is the scale path for PHRASE blocklists and contamination probes:
  * k patterns cost one text traversal, not k `regexp_count`/`replace`
  * passes — at 100 TB the naive formulation re-reads the corpus k times
  * inside the scan stage, while the automaton's per-byte work is one array
  * lookup regardless of k. Matching is raw substring (not token-bounded;
  * compose with the token-exact [[graft.ops.CorpusSignals.blocklistGate]]
  * when Scunthorpe safety matters), byte-level over UTF-8 — exact byte
  * equality of a valid UTF-8 pattern coincides with character equality, so
  * counts match any char-positional oracle.
  *
  * The automaton is the expression's private constant: built lazily on
  * first use, attached to generated code as a reference object (the plan
  * ships the PATTERNS, each executor materializes the automaton once).
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "multi_match: need at least one pattern")
  require(patterns.forall(_.nonEmpty), "multi_match: patterns must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match expects string, got ${child.dataType}")

  @transient private lazy val automaton = new AcAutomaton(
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MultiMatch.compute(v.asInstanceOf[UTF8String], automaton)
  }

  /** Static-call codegen (the GramStats pattern); the automaton rides the
    * generated class's reference array, so the per-row code is one call.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val auto = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MultiMatch.compute($c, $auto);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

object MultiMatch {
  /** Shared interpreted/generated kernel: one byte-level automaton walk,
    * incrementing every pattern that ends at the current position (the
    * node's precomputed output set already includes suffix-link outputs,
    * so overlapping and nested matches all count).
    */
  def compute(v: UTF8String, a: AcAutomaton): ArrayData = {
    val bytes = v.getBytes
    val counts = new Array[Long](a.nPatterns)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = a.delta(s)(bytes(i) & 0xff)
      val out = a.outputs(s)
      if (out != null) {
        var j = 0
        while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Register `multi_match(text, 'p1', 'p2', ...)` as a session function
    * (patterns must be string literals — they compile into the automaton).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_match",
      (exprs: Seq[Expression]) => {
        require(exprs.length >= 2, "multi_match(text, pattern, ...)")
        val pats = exprs.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"multi_match: patterns must be string literals, got $other")
        }
        MultiMatch(exprs.head, pats)
      },
      "built-in")
}

/** The Aho–Corasick automaton in dense delta form: a full 256-way
  * transition table per node (failure links resolved at build time, so the
  * hot loop is a single array index per input byte) plus per-node merged
  * output sets (pattern ids ending at the node, INCLUDING every proper
  * suffix that is itself a pattern — merged through the failure links).
  * Built once per expression on each executor; size is Θ(256·Σ|pattern|)
  * ints, the classic time-for-space trade of the dense construction.
  */
final class AcAutomaton(patternBytes: Array[Array[Byte]]) extends Serializable {
  val nPatterns: Int = patternBytes.length

  val (delta: Array[Array[Int]], outputs: Array[Array[Int]]) = {
    val next = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    patternBytes.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (next(s)(c) == -1) {
          next += Array.fill(256)(-1)
          out += Nil
          next(s)(c) = next.length - 1
        }
        s = next(s)(c)
      }
      out(s) = pid :: out(s)
    }
    // BFS: failure links, then resolve to a dense DFA and merge outputs
    val n = next.length
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val t = next(0)(c)
      if (t == -1) next(0)(c) = 0
      else { fail(t) = 0; queue += t }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ::: out(fail(s))
      (0 until 256).foreach { c =>
        val t = next(s)(c)
        if (t == -1) next(s)(c) = next(fail(s))(c)
        else { fail(t) = next(fail(s))(c); queue += t }
      }
    }
    (next.toArray,
      out.map(o => if (o.isEmpty) null else o.toArray.sorted).toArray)
  }
}
