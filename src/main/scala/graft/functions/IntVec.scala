package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer vector kernels for the [[graft.operators.SimilarityInt]]
  * family — `int_l2sq(a, b)` (Σ(aᵢ−bᵢ)²) and `int_dot(a, b)`
  * (Σ aᵢ·bᵢ) over two `array<bigint>` columns.
  *
  * Native for the same reason as [[CosineSim]]: Spark evaluates
  * higher-order functions interpreted, and the integer ANN paths
  * compute one of these per (vector, centroid) or (query, candidate)
  * pair — the r20 bench read the HOF-formulated q43 at 3.4× the
  * codegen'd-float q43 it replaced, with the lambda machinery as the
  * whole gap (measured; see ARCHITECTURE r20). One JIT'd loop per
  * pair restores the float form's cost at integer-exact semantics.
  *
  * Semantics are IDENTICAL to the `aggregate(zip_with(...))`
  * formulation they replace WITHIN THE DOCUMENTED COORDINATE BOUNDS
  * (spec-pinned there): exact BIGINT arithmetic (integer addition is
  * associative — no accumulation-order caveat needed), null on length
  * mismatch (the HOF's zip_with null-pad behavior). Overflow
  * (ADVICE r20): PAST the bounds these kernels WRAP (Java long
  * arithmetic) where the ANSI-mode HOF would throw — a caller feeding
  * the registered catalog functions un-bounded values gets wrapped
  * garbage, not an error. In-repo callers stay far inside: |z| ≤
  * 2·10⁴ per coordinate everywhere (the z coding ±1e4, residuals
  * ±2e4; [[graft.operators.Spectral]]'s |y| ≤ 255 / |v| ≤ 1000 with
  * its own documented d ceilings), so per-element products sit
  * ≤ 1.6e9 and 64-dim sums ≤ ~10¹¹ — five orders under int64. */
case class IntL2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int_l2sq requires two array<bigint> args, got $l and $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntVecCore.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("l2Res")
      s"""
         |java.lang.Long $res = graft.functions.IntVecCore.l2sq($a, $b);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntL2Sq =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "int_l2sq"
}

case class IntDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int_dot requires two array<bigint> args, got $l and $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntVecCore.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dotRes")
      s"""
         |java.lang.Long $res = graft.functions.IntVecCore.dot($a, $b);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "int_dot"
}

object IntVecCore {
  /** Null (boxed) on length mismatch — the zip_with-pad contract. */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

object IntL2Sq {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "int_l2sq", classOf[IntL2Sq])
}

object IntDot {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "int_dot", classOf[IntDot])
}
