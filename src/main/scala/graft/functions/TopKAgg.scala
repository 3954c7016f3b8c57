package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `topk_agg(id, score, k)` → array<struct<id, score:long>> ordered by
  * (score DESC, id ASC): bounded top-k as a Catalyst AGGREGATE — the
  * third merge discipline next to [[HllSketchAgg]] (max-merge) and
  * [[CmsSketchAgg]] (sum-merge): a k-bounded heap whose merge keeps the
  * k best of both sides.
  *
  * This is the 100 TB replacement for the rank-window top-k-per-group:
  * `Window.partitionBy(g).orderBy(score)` shuffles EVERY row to its
  * group's partition before ranking (WindowGroupLimit prunes per-task but
  * the exchange still carries up to k rows per (group, task) AFTER the
  * limit push — and nothing before Spark 3.5), whereas
  * `groupBy(g).agg(topk_agg(id, score, k))` combines map-side into one
  * ≤k-entry buffer per (group, task) and exchanges those buffers only,
  * composing with any other aggregate in the same pass.
  *
  * The result is the top-k SET under the total order (score DESC, id
  * ASC) — a pure function of the group's row set, so the aggregate is
  * bit-deterministic under any partitioning (TopKAggSpec pins parity
  * with the rank window). `id` may be long or string (binary/UTF-8 byte
  * order, matching ANSI engines' default collation); `score` is long —
  * quantize floats to integer micro-units first, as everywhere else in
  * the repo's reproducibility contract. Null id or score skips the row.
  */
case class TopKAgg(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k >= 1 && k <= (1 << 20), "topk_agg: need 1 <= k <= 2^20")

  // lazy: children are unresolved at construction time
  private lazy val stringId = id.dataType == StringType

  override def children: Seq[Expression] = Seq(id, score)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", id.dataType, nullable = false),
      StructField("score", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType != StringType && id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg: id must be string or bigint, got ${id.dataType}")
    else if (score.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg: score must be bigint, got ${score.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k, stringId)

  override def update(buffer: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null) {
      // UTF8String from an unsafe row aliases reused memory — copy before
      // the value outlives this input row
      val key = i match {
        case u: UTF8String => u.clone()
        case other => other
      }
      buffer.offer(key, s.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKAgg.Buffer): Any = {
    val sorted = buffer.descending
    new GenericArrayData(sorted.map { e =>
      new GenericInternalRow(Array[Any](e._1, e._2))
    })
  }

  override def serialize(buffer: TopKAgg.Buffer): Array[Byte] = buffer.toBytes

  override def deserialize(storageFormat: Array[Byte]): TopKAgg.Buffer =
    TopKAgg.Buffer.fromBytes(storageFormat, k, stringId)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(id = newChildren(0), score = newChildren(1))

  override def prettyName: String = "topk_agg"
}

object TopKAgg {

  /** `a` outranks `b` under the result order (score DESC, id ASC)? */
  private def beats(aId: Any, aScore: Long, bId: Any, bScore: Long,
      stringId: Boolean): Boolean =
    if (aScore != bScore) aScore > bScore
    else if (stringId)
      aId.asInstanceOf[UTF8String].compareTo(bId.asInstanceOf[UTF8String]) < 0
    else aId.asInstanceOf[Long] < bId.asInstanceOf[Long]

  /** A k-bounded min-heap keyed worst-first, so a full buffer evicts in
    * O(log k) only when the newcomer outranks the current worst. Duplicate
    * (id, score) pairs are kept — the aggregate ranks rows, not keys.
    */
  final class Buffer(k: Int, stringId: Boolean) {
    // worst-first: a sorts before b iff b beats a
    private val heap = new java.util.PriorityQueue[(Any, Long)](
      math.min(k, 1 << 10),
      (a: (Any, Long), b: (Any, Long)) =>
        if (a._1 == b._1 && a._2 == b._2) 0
        else if (beats(b._1, b._2, a._1, a._2, stringId)) -1
        else 1)

    def offer(id: Any, score: Long): Unit =
      if (heap.size < k) heap.add((id, score))
      else {
        val worst = heap.peek()
        if (beats(id, score, worst._1, worst._2, stringId)) {
          heap.poll()
          heap.add((id, score))
        }
      }

    def foreach(f: (Any, Long) => Unit): Unit = {
      val it = heap.iterator()
      while (it.hasNext) { val e = it.next(); f(e._1, e._2) }
    }

    /** Entries best-first — the output order. */
    def descending: Array[(Any, Long)] = {
      val arr = heap.toArray(new Array[(Any, Long)](heap.size))
      scala.util.Sorting.stableSort(arr,
        (a: (Any, Long), b: (Any, Long)) => beats(a._1, a._2, b._1, b._2, stringId))
      arr
    }

    def toBytes: Array[Byte] = {
      val entries = descending
      val byteLen = 4 + entries.map { e =>
        8 + (if (stringId) 4 + e._1.asInstanceOf[UTF8String].numBytes else 8)
      }.sum
      val bb = java.nio.ByteBuffer.allocate(byteLen)
      bb.putInt(entries.length)
      entries.foreach { e =>
        bb.putLong(e._2)
        if (stringId) {
          val bytes = e._1.asInstanceOf[UTF8String].getBytes
          bb.putInt(bytes.length)
          bb.put(bytes)
        } else bb.putLong(e._1.asInstanceOf[Long])
      }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte], k: Int, stringId: Boolean): Buffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val buf = new Buffer(k, stringId)
      val n = bb.getInt()
      var i = 0
      while (i < n) {
        val score = bb.getLong()
        val id: Any =
          if (stringId) {
            val len = bb.getInt()
            val arr = new Array[Byte](len)
            bb.get(arr)
            UTF8String.fromBytes(arr)
          } else bb.getLong()
        buf.offer(id, score)
        i += 1
      }
      buf
    }
  }

  /** Register `topk_agg(id, score, k)` as a session aggregate function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_agg",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "topk_agg(id, score, k)")
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_agg: k must be an integer literal, got $other")
        }
        TopKAgg(exprs(0), exprs(1), k).toAggregateExpression()
      },
      "built-in")
}
