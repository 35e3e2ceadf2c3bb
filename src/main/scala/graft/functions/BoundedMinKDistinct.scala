package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `bounded_min_k_distinct(col, k) -> array<bigint>`: the k smallest
  * DISTINCT values of a LongType column per group, ascending — with
  * aggregation state bounded at k values at every plan stage, the
  * [[BoundedMinK]] contract with set semantics.
  *
  * This is exactly the state of a KMV (k-minimum-values) cardinality
  * sketch [Bar-Yossef et al. 2002; Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007]:
  * hash every element into a fixed integer space, keep the k smallest
  * distinct hashes, and estimate the distinct count from the k-th
  * smallest — `(k-1)·M / h_k` for hash space `[0, M)`. The estimator
  * needs DISTINCT minima (a duplicated element must not occupy two of
  * the k slots, or every duplicate would bias the estimate downward),
  * which is why [[BoundedMinK]]'s multiset heap cannot serve: its k
  * slots fill with copies. The set-capped buffer here is the sketch —
  * mergeable (union of sets, re-capped, is associative and
  * commutative, Agarwal et al., "Mergeable Summaries", PODS 2012),
  * map-side-combining, and O(k) per group no matter how hot the key.
  *
  * Determinism: the k smallest distinct values of a multiset are a
  * pure function of the element SET — duplication counts, partition
  * order, and merge order cannot leak. Emitted ascending. NULLs are
  * skipped (the `collect_list` convention).
  *
  * Buffer: a size-capped `TreeSet` — O(log k) membership + insert +
  * max-eviction in one structure. k ≤ [[BoundedMinK.MaxK]] keeps the
  * shuffled buffer row small, same rationale as [[BoundedMinK]].
  */
case class BoundedMinKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinKDistinct.MinKSetBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_min_k_distinct requires a bigint column, got ${child.dataType}")
    else if (k <= 0 || k > BoundedMinK.MaxK)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_min_k_distinct: k must be in [1, ${BoundedMinK.MaxK}], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BoundedMinKDistinct.MinKSetBuffer =
    new BoundedMinKDistinct.MinKSetBuffer(k)

  override def update(buf: BoundedMinKDistinct.MinKSetBuffer,
                      input: InternalRow): BoundedMinKDistinct.MinKSetBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedMinKDistinct.MinKSetBuffer,
                     other: BoundedMinKDistinct.MinKSetBuffer): BoundedMinKDistinct.MinKSetBuffer = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: BoundedMinKDistinct.MinKSetBuffer): Any =
    new GenericArrayData(buf.sortedAscending)

  override def serialize(buf: BoundedMinKDistinct.MinKSetBuffer): Array[Byte] = {
    val vs = buf.sortedAscending
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinKDistinct.MinKSetBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedMinKDistinct.MinKSetBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinKDistinct =
    copy(child = newChild)

  override def prettyName: String = "bounded_min_k_distinct"
}

object BoundedMinKDistinct {

  /** Size-capped sorted set of longs: dedup + ordered max-eviction in
    * one O(log k) structure; can never exceed k elements. */
  final class MinKSetBuffer(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def add(v: Long): Unit =
      if (set.size < k) set.add(v)
      else if (set.last() > v) { if (set.add(v)) set.pollLast() }

    def addAll(other: MinKSetBuffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def sortedAscending: Array[Long] = {
      val arr = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      arr
    }
  }

  /** Register `bounded_min_k_distinct` ([[Registration]]). k must be a
    * foldable integer literal (it shapes the agg buffer). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "bounded_min_k_distinct", classOf[BoundedMinKDistinct])
}
