package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `misra_gries(col, k) -> array<struct<v:bigint, c:bigint>>`: a
  * Misra–Gries heavy-hitter summary of a LongType column per group —
  * at most k (value, estimated-count) counters, with aggregation state
  * bounded at k counters at EVERY plan stage (map-side partials
  * included), descending by count (value ascending on ties).
  *
  * This is the DETERMINISTIC-guarantee complement of the count-min
  * sketch ([[graft.operators.Sketches.countMinCounters]]): count-min
  * never underestimates but can only be probed for keys you already
  * know; Misra–Gries [Misra & Gries, "Finding Repeated Elements",
  * 1982] returns the candidate keys THEMSELVES with three worst-case
  * guarantees that hold on any input, any partitioning, any merge
  * tree (Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *   1. never OVERestimates: `c(v) <= f(v)` (true frequency);
  *   2. bounded underestimate: `f(v) - c(v) <= (n - sum_c) / (k+1)`
  *      where n is the group's total count and sum_c the sum of the
  *      summary's counters — computable FROM the output, so the bound
  *      ships as data ([[graft.ops.EventQueries]] q162 certifies it);
  *   3. total recall above the line: every value with
  *      `f(v) * (k+1) > n` appears in the summary (its underestimate
  *      bound is below its frequency, so its counter cannot reach 0).
  *
  * Update is the classic stream form: known value → +1; room → insert
  * at 1; full → decrement ALL k counters by 1 (the arriving value's
  * virtual counter absorbs the k+1-th decrement), dropping zeros.
  * Merge is the PODS-2012 form: add counters pointwise, and if more
  * than k survive, subtract the (k+1)-th largest count from all and
  * drop non-positives — associative-in-error, so map-side combine and
  * arbitrary merge order keep guarantee 2.
  *
  * Determinism: when the group's DISTINCT cardinality is <= k, no
  * decrement ever fires on any path (partial maps hold one counter
  * per distinct value; the merged map never exceeds k counters), so
  * the summary is the EXACT frequency table — a pure function of the
  * data, oracle-hashable (q161 runs this regime). With more than k
  * distinct values the counter VALUES depend on partition/merge order
  * (inherent to MG), but guarantees 1–3 still hold on every path —
  * that regime is certified by q162's theorem-as-data columns and the
  * adversarial spec, the q143 "guarantee as data" convention.
  *
  * Buffer: a HashMap of the ≤ k counters — nothing else is needed or
  * serialized (the q162 bound derives the group total n from a plain
  * count(*) beside the summary). k <= [[MisraGries.MaxK]]:
  * the overflow decrement walks all k counters, so the cap is far
  * tighter than [[BoundedMinK.MaxK]] — heavy-hitter k is 10s-100s.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.MgBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a bigint column, got ${child.dataType}")
    else if (k <= 0 || k > MisraGries.MaxK)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries: k must be in [1, ${MisraGries.MaxK}], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = MisraGries.OutType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MisraGries.MgBuffer =
    new MisraGries.MgBuffer(k)

  override def update(buf: MisraGries.MgBuffer,
                      input: InternalRow): MisraGries.MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MisraGries.MgBuffer,
                     other: MisraGries.MgBuffer): MisraGries.MgBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MisraGries.MgBuffer): Any = {
    val entries = buf.sortedEntries
    new GenericArrayData(entries.map { case (v, c) =>
      new GenericInternalRow(Array[Any](v, c))
    })
  }

  override def serialize(buf: MisraGries.MgBuffer): Array[Byte] = {
    val entries = buf.sortedEntries
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MisraGries.MgBuffer(k)
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def prettyName: String = "misra_gries"
}

object MisraGries {

  /** The decrement walk is O(k), so heavy-hitter k stays small. */
  val MaxK = 4096

  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  /** k-capped counter map. `add` is the stream update; `put`/`mergeIn`
    * rebuild/combine partials with the PODS-2012 truncation. */
  final class MgBuffer(k: Int) {
    private val m = new java.util.HashMap[Long, Long]()

    def add(v: Long): Unit = {
      val cur = m.get(v)
      if (cur != 0L) m.put(v, cur + 1L)
      else if (m.size < k) m.put(v, 1L)
      else decrementAll()
    }

    /** Decrement every counter by 1 (the arriving unseen value's
      * virtual counter is the k+1-th), dropping zeros. */
    private def decrementAll(): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }

    /** Deserialization insert: counters are trusted partial state. */
    def put(v: Long, c: Long): Unit = m.put(v, c)

    def mergeIn(other: MgBuffer): Unit = {
      val it = other.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = m.get(e.getKey) // absent unboxes to 0L; stored counters are > 0
        m.put(e.getKey, cur + e.getValue)
      }
      if (m.size > k) {
        // subtract the (k+1)-th largest count from all, drop <= 0
        val counts = new Array[Long](m.size)
        var i = 0
        val cit = m.values().iterator()
        while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val cut = counts(counts.length - k - 1) // (k+1)-th largest
        val eit = m.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
        }
      }
    }

    /** (count desc, value asc) — a deterministic order of whatever
      * counter multiset the run produced. */
    def sortedEntries: Array[(Long, Long)] = {
      val arr = new Array[(Long, Long)](m.size)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1
      }
      scala.util.Sorting.stableSort(arr,
        (a: (Long, Long), b: (Long, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      arr
    }
  }

  /** Register `misra_gries` ([[Registration]]). k must be a foldable
    * integer literal (it shapes the agg buffer). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "misra_gries", classOf[MisraGries])
}
