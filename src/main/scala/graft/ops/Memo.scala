package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-session memo for query legs that several registered queries
  * share — e.g. the exact 3-gram Jaccard pair set (q34's output, and
  * the recall denominator for q60/q61) and the brute-force cosine
  * top-k (q40's output, and the baseline for q57/q58). Without it a
  * full Verify/Bench run pays for each shared leg once per consumer
  * (~3x for the two above, measured as ~5 s of the sf0.1 bench).
  *
  * Entries persist at MEMORY_AND_DISK — recomputable on executor
  * loss (unlike a localCheckpoint), spilling instead of OOMing — and
  * are keyed per SparkSession (weakly, so a stopped session's entries
  * are collectable) and per caller-supplied key, which must encode
  * every input that changes the result (dir + all dials).
  *
  * Benchmarks that time repeated passes must call [[clear]] between
  * passes: a memo hit costs ~nothing, and a min-of-N over passes
  * would otherwise report the cache read, not the query.
  */
object Memo {

  private val perSession =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()

  /** The memoized frame for `key`, building + persisting it on first
    * use in this session. `build` runs at most once per (session, key)
    * and must be deterministic for the key. */
  def of(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      val m = perSession.computeIfAbsent(
        spark, _ => scala.collection.mutable.Map.empty[String, DataFrame])
      m.getOrElseUpdate(key, build.persist(StorageLevel.MEMORY_AND_DISK))
    }

  /** Unpersist and forget every entry of this session. */
  def clear(spark: SparkSession): Unit = synchronized {
    Option(perSession.remove(spark))
      .foreach(_.values.foreach(_.unpersist(blocking = false)))
  }
}
