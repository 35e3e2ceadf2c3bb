package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `srp_buckets(vec, tables, bits, seed) -> array<bigint>`: signed-
  * random-projection LSH bucket ids — one bucket per hash table, each
  * the packed sign bits of `bits` Gaussian hyperplane projections.
  *
  * Native expression for the same reason as [[MinHashSigs]]: the
  * higher-order formulation (tables×bits interpreted
  * `zip_with`+`aggregate` folds per row) was the dominant cost of the
  * ANN bench (q41/q42). This is one JIT'd triple loop with codegen —
  * the projections are mathematically identical (same plane values,
  * same left-to-right accumulation order), so bucket ids are
  * bit-equal to the interpreted formulation.
  *
  * Hyperplanes are derived deterministically from (dim, tables, bits,
  * seed) — dim read from each row's vector length — and cached per
  * executor, so every task on every executor projects against the
  * same planes with no driver round-trip and no broadcast.
  */
case class SrpBuckets(child: Expression, tables: Int, bits: Int, seed: Long)
    extends UnaryExpression {
  require(tables > 0 && bits > 0 && bits <= 63,
    s"srp_buckets: tables must be > 0 and 0 < bits <= 63, got tables=$tables bits=$bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"srp_buckets requires array<float> or array<double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SrpBuckets.compute(input.asInstanceOf[ArrayData], tables, bits, seed, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpBuckets.compute($c, $tables, $bits, ${seed}L, $childIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)

  override def prettyName: String = "srp_buckets"
}

object SrpBuckets {
  private final case class PlaneKey(dim: Int, tables: Int, bits: Int, seed: Long)

  /** Flattened [tables][bits][dim] Gaussian planes; fill order matches
    * `Array.fill(tables, bits, dim)(rnd.nextGaussian())` so bucket ids
    * are stable across releases of this file. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[PlaneKey, Array[Double]]()

  private def planesFor(dim: Int, tables: Int, bits: Int, seed: Long): Array[Double] =
    planeCache.computeIfAbsent(PlaneKey(dim, tables, bits, seed), k => {
      val rnd = new scala.util.Random(k.seed)
      Array.fill(k.tables * k.bits * k.dim)(rnd.nextGaussian())
    })

  def compute(arr: ArrayData, tables: Int, bits: Int, seed: Long,
              isFloat: Boolean): GenericArrayData = {
    val dim = arr.numElements()
    val planes = planesFor(dim, tables, bits, seed)
    val vec = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      vec(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    val out = new Array[Long](tables)
    var off = 0
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += vec(i) * planes(off + i); i += 1 }
        if (acc > 0) bucket |= (1L << b)
        off += dim
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Register `srp_buckets` (idempotent); tables/bits/seed must be
    * foldable integer literals. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "srp_buckets", classOf[SrpBuckets])
}
