package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared cache-lifecycle helper for operators that pin an internal
  * frame consumed several times inside ONE returned plan (delta
  * dedup's exact-novel text, the power iteration's centered codes). */
object CacheLifecycle {

  /** Unpersist `frame` after the session's next completed action —
    * the lazy lifecycle leg (see [[Dedup.deltaDedup]]'s
    * `releaseEagerly = false` contract). One self-removing listener
    * per call; the first action on the session (success or failure)
    * releases the cache. The first action is the right release point
    * because the caller receives a SINGLE frame derived from `frame`
    * — by the time any action on it completes, the cached blocks have
    * served every consumer in that plan. If the caller never runs an
    * action the frame lives until session end: the bounded, disclosed
    * cost of staying lazy. */
  private[operators] def releaseAfterNextAction(frame: DataFrame): Unit = {
    val spark = frame.sparkSession
    val listener: org.apache.spark.sql.util.QueryExecutionListener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        private def done(): Unit = {
          frame.unpersist(blocking = false)
          spark.listenerManager.unregister(this)
        }
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = done()
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = done()
      }
    spark.listenerManager.register(listener)
  }
}
