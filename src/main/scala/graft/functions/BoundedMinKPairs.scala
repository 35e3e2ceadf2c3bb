package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `bounded_min_k_pairs(ord, tag, k) -> array<struct<ord, tag>>`: the
  * k lexicographically-smallest `(ord, tag)` pairs per group,
  * ascending — [[BoundedMinK]]'s bounded-state contract extended to
  * ARG-min-k: "which rows have the k smallest values" without
  * shipping every row of a hot group to one task.
  *
  * This is the aggregate form of `row_number() OVER (PARTITION BY g
  * ORDER BY ord, tag) <= k`: the window shuffles and SORTS the
  * group's entire row set on one task (the q123 skew kill), while
  * this buffer holds ≤ k pairs at every plan stage with map-side
  * partials. The tag column is the payload (a doc id, a user id) and
  * the tie-break in one: pairs are compared (ord, tag)
  * lexicographically, so the result is a pure function of the pair
  * multiset — partition and merge order cannot leak.
  *
  * The primary engine consumer is weighted priority sampling (q148):
  * with `ord = hash div weight` the k smallest priorities ARE the
  * Duffield–Lund–Thorup priority sample, and the buffer is the
  * sample's reservoir. NULL in either column skips the row. */
case class BoundedMinKPairs(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinKPairs.PairBuffer]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_min_k_pairs requires bigint columns, got " +
          s"(${left.dataType}, ${right.dataType})")
    else if (k <= 0 || k > BoundedMinK.MaxK)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_min_k_pairs: k must be in [1, ${BoundedMinK.MaxK}], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("tag", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BoundedMinKPairs.PairBuffer =
    new BoundedMinKPairs.PairBuffer(k)

  override def update(buf: BoundedMinKPairs.PairBuffer,
                      input: InternalRow): BoundedMinKPairs.PairBuffer = {
    val o = left.eval(input)
    val t = right.eval(input)
    if (o != null && t != null)
      buf.add(o.asInstanceOf[Long], t.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedMinKPairs.PairBuffer,
                     other: BoundedMinKPairs.PairBuffer): BoundedMinKPairs.PairBuffer = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: BoundedMinKPairs.PairBuffer): Any = {
    val pairs = buf.sortedAscending
    new GenericArrayData(pairs.map { case (o, t) =>
      InternalRow(o, t)
    })
  }

  override def serialize(buf: BoundedMinKPairs.PairBuffer): Array[Byte] = {
    val vs = buf.sortedAscending
    val bb = ByteBuffer.allocate(4 + 16 * vs.length)
    bb.putInt(vs.length)
    vs.foreach { case (o, t) => bb.putLong(o); bb.putLong(t) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinKPairs.PairBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedMinKPairs.PairBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedMinKPairs =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bounded_min_k_pairs"
}

object BoundedMinKPairs {

  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  /** k-capped max-heap over (ord, tag) pairs, lexicographic. */
  final class PairBuffer(k: Int) {
    private val heap = new java.util.PriorityQueue[(Long, Long)](
      math.max(1, math.min(k, 16)), ord.reverse)

    def add(o: Long, t: Long): Unit = {
      val p = (o, t)
      if (heap.size < k) heap.offer(p)
      else if (ord.gt(heap.peek(), p)) { heap.poll(); heap.offer(p) }
    }

    def addAll(other: PairBuffer): Unit = {
      val it = other.heap.iterator()
      while (it.hasNext) { val p = it.next(); add(p._1, p._2) }
    }

    def sortedAscending: Array[(Long, Long)] = {
      val arr = new Array[(Long, Long)](heap.size)
      val it = heap.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr, ord)
      arr
    }
  }

  /** Register `bounded_min_k_pairs` ([[Registration]]); k must be a
    * foldable integer literal (it shapes the agg buffer). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "bounded_min_k_pairs", classOf[BoundedMinKPairs])
}
