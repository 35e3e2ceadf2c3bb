package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Once-per-session SQL function registration.
  *
  * Each function object's `register` must be cheap to call from every
  * operator invocation, yet guarantee that the name resolves to
  * GRAFT's expression builder. The two naive guards both fail one of
  * those: unconditional createOrReplace logs a "replaced a previously
  * registered function" WARN on every call, while a bare
  * `functionExists` early-return trusts whatever is already registered
  * under the name — if a user session had its own `cosine_sim` (e.g.
  * via spark.udf.register), graft operators would silently compute
  * with the foreign implementation.
  *
  * So the guard is session-tagged: a weak per-session set records
  * which names GRAFT has registered in that session. First call per
  * (session, name) does createOrReplace — claiming the name over any
  * pre-existing foreign function, with at most the one replace-WARN —
  * and every later call is a set lookup. A user who re-registers the
  * name AFTER graft claimed it wins (their session, their explicit
  * choice).
  */
object Registration {

  private val claimed =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[String]]()

  def once(spark: SparkSession, name: String)
          (builder: Seq[Expression] => Expression): Unit = synchronized {
    val names = claimed.computeIfAbsent(
      spark, _ => scala.collection.mutable.Set.empty[String])
    if (names.add(name))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
  }
}
