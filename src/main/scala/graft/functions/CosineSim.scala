package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `cosine_sim(a, b) -> double`: exact cosine similarity between two
  * vectors, computed as dot(a,b) / (‖a‖·‖b‖) with strict left-to-right
  * accumulation — bit-identical to the higher-order
  * `aggregate(zip_with(...))` formulation it replaces, and therefore
  * deterministic across partitionings (hash-stable oracle outputs).
  *
  * Native expression for the same reason as [[SrpBuckets]]: Spark
  * evaluates higher-order functions interpreted, and the brute-force
  * top-k / candidate-verification paths score |queries|·|corpus| (or
  * |collisions|) pairs — three folds per pair dominated the similarity
  * bench. One JIT'd loop computes all three accumulators per pair.
  *
  * Mismatched lengths return null (the HOF formulation yields null via
  * zip_with padding); zero-norm vectors yield NaN, as before.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<float|double> args, got $l and $r")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("cosRes")
      s"""
         |java.lang.Double $res = graft.functions.CosineSim.compute(
         |  $a, $b, ${isFloatArr(left)}, ${isFloatArr(right)});
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Returns null (boxed) on length mismatch, else the similarity. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Register `cosine_sim` — once per session, claiming the name over
    * any foreign pre-registration (see [[Registration]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "cosine_sim", classOf[CosineSim])
}
