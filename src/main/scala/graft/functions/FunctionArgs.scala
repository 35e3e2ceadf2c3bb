package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Argument validation for the SQL `register` builders: the function
  * registry hands us a raw `Seq[Expression]`, so without these checks
  * a missing argument or a non-literal surfaces as an opaque
  * IndexOutOfBounds/ClassCast/NPE at analysis time. Raise a real
  * AnalysisException naming the function and the expected signature
  * instead.
  */
object FunctionArgs {

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> msg))

  def requireArity(fn: String, exprs: Seq[Expression], n: Int, signature: String): Unit =
    if (exprs.length != n)
      fail(s"$fn expects $n arguments but got ${exprs.length}; usage: $signature")

  /** Ranged form for functions with trailing optional arguments —
    * same AnalysisException type and message format as [[requireArity]]
    * so wrong-arity errors stay uniform across the catalog. */
  def requireArity(fn: String, exprs: Seq[Expression], min: Int, max: Int,
                   signature: String): Unit =
    if (exprs.length < min || exprs.length > max)
      fail(s"$fn expects $min to $max arguments but got ${exprs.length}; " +
        s"usage: $signature")

  private def foldableNumber(fn: String, e: Expression, argName: String): Number = {
    if (!e.foldable)
      fail(s"$fn: argument '$argName' must be a literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n
      case other =>
        fail(s"$fn: argument '$argName' must be an integer literal, got $other")
    }
  }

  def foldableInt(fn: String, e: Expression, argName: String): Int =
    foldableNumber(fn, e, argName).intValue()

  def foldableLong(fn: String, e: Expression, argName: String): Long =
    foldableNumber(fn, e, argName).longValue()

  def foldableString(fn: String, e: Expression, argName: String): String = {
    if (!e.foldable)
      fail(s"$fn: argument '$argName' must be a literal, got ${e.sql}")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other =>
        fail(s"$fn: argument '$argName' must be a string literal, got $other")
    }
  }
}
