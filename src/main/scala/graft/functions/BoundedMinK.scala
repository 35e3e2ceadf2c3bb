package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `bounded_min_k(col, k) -> array<bigint>`: the k smallest values of
  * a LongType column per group, ascending — with aggregation state
  * BOUNDED AT k VALUES at every stage of the plan.
  *
  * Why a native aggregate and not a window: the row_number-per-key
  * formulation shuffles EVERY (key, value) row to the key's partition
  * and sorts it there — a hot key (a stopword's posting list, a
  * celebrity user's events) concentrates its entire row set on one
  * task, the classic skew kill. `collect_list` + `slice` keeps the
  * plan shape but its agg buffer holds the key's FULL value set
  * before the slice — a df=10⁸ term materializes a multi-GB buffer
  * row. This aggregate's buffer is a k-capped max-heap: partial
  * (map-side) aggregation already discards everything past the local
  * top-k, so a hot key ships at most k·(#partitions touching it)
  * values through the shuffle and holds ≤ k values in any buffer.
  * That is what makes bounded posting heads / per-key samples safe at
  * 100 TB.
  *
  * Determinism: the k smallest of a multiset is a pure function of
  * the multiset (ties among equal values are indistinguishable), and
  * the result is emitted sorted — partition order can't leak.
  * NULL inputs are skipped, the `collect_list` convention.
  */
case class BoundedMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinK.MinKBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_min_k requires a bigint column, got ${child.dataType}")
    else if (k <= 0 || k > BoundedMinK.MaxK)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_min_k: k must be in [1, ${BoundedMinK.MaxK}], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BoundedMinK.MinKBuffer =
    new BoundedMinK.MinKBuffer(k)

  override def update(buf: BoundedMinK.MinKBuffer,
                      input: InternalRow): BoundedMinK.MinKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedMinK.MinKBuffer,
                     other: BoundedMinK.MinKBuffer): BoundedMinK.MinKBuffer = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: BoundedMinK.MinKBuffer): Any =
    new GenericArrayData(buf.sortedAscending)

  override def serialize(buf: BoundedMinK.MinKBuffer): Array[Byte] = {
    val vs = buf.sortedAscending
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinK.MinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedMinK.MinKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinK =
    copy(child = newChild)

  override def prettyName: String = "bounded_min_k"
}

object BoundedMinK {

  /** Ceiling on k: the buffer ships through every shuffle row, so an
    * absurd k would silently rebuild the unbounded-collect problem
    * this aggregate exists to prevent. */
  val MaxK = 65536

  /** k-capped max-heap over longs: `add` is O(log k) and the
    * structure can never exceed k elements, whatever the input. */
  final class MinKBuffer(k: Int) {
    private val heap =
      new java.util.PriorityQueue[java.lang.Long](
        math.max(1, math.min(k, 16)), java.util.Collections.reverseOrder())

    def add(v: Long): Unit =
      if (heap.size < k) heap.offer(v)
      else if (heap.peek() > v) { heap.poll(); heap.offer(v) }

    def addAll(other: MinKBuffer): Unit = {
      val it = other.heap.iterator()
      while (it.hasNext) add(it.next())
    }

    def sortedAscending: Array[Long] = {
      val arr = new Array[Long](heap.size)
      val it = heap.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      arr
    }
  }

  /** Register `bounded_min_k` — once per session ([[Registration]]).
    * k must be a foldable integer literal (it shapes the agg buffer). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "bounded_min_k", classOf[BoundedMinK])
}
