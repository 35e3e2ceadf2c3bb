package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.FunctionCatalog

/** Catalyst extension entry point: inject the engine's native SQL
  * functions at session build time via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — the integration path for SQL-only users and for clusters where
  * the session is constructed by infrastructure (Thrift server,
  * notebooks, spark-submit conf) rather than by [[GraftSession]].
  * Injected functions live in the session's registry exactly like
  * built-ins; `GraftSession.registerFunctions` remains the
  * programmatic equivalent. Both routes iterate the SAME
  * [[graft.functions.FunctionCatalog]] table, so they are equivalent
  * by construction — adding a function to the catalog ships it on
  * both routes in the same commit (no per-route list to drift).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit =
    FunctionCatalog.all.foreach { d =>
      ext.injectFunction(
        (FunctionIdentifier(d.name), info(d.name, d.usage), d.builder))
    }
}
