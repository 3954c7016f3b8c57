package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash (Charikar 2002) of a token-hash array, codegen-native: per bit
  * position b, sum ±1 votes over the hashes ((h >> b) & 1 ? +1 : -1); bit
  * set in the result iff the vote is positive. Hashes must be
  * non-negative and < 2^bits (callers reduce with pmod), which makes the
  * shift-and-mask identical to the floor(h / 2^b) % 2 arithmetic the
  * DuckDB oracle uses.
  *
  * Replaces the HOF formulation (aggregate + zip_with over a `bits`-slot
  * accumulator array): that is interpreted and allocates a fresh
  * 32-element array per TOKEN — measured as most of q_simhash's cost.
  * Here the votes live in one stack-local array per row inside generated
  * code.
  */
case class SimHashVotes(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash expects array<bigint>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_votes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $votes = new long[$bits];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $votes[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashVotes =
    copy(child = newChild)
}
