package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-vs-exact agreement summary — the numeric quality signal
  * for the ANN/LSH paths whose raw outputs depend on engine-internal
  * hashing (xxhash64 bands, SRP planes) that no cross-engine oracle
  * can reproduce. Instead of a rows-only check, each path registers a
  * one-row summary against its in-Spark exact baseline: counts are
  * integers, recall is a single integer division — both
  * bit-deterministic for a fixed (seed, fixture), so the driver can
  * hash-compare them against pinned expected values.
  */
object Agreement {

  /** One-row set-agreement between `approx` and `exact` on `keys`
    * (both must be key-distinct): ONE full-outer join + one aggregate,
    * so each input is scanned exactly once — no count/join double
    * evaluation. Output: n_exact, n_approx, n_hits (all BIGINT),
    * recall = n_hits / n_exact (DOUBLE; 0.0 when exact is empty). */
  def summarize(approx: DataFrame, exact: DataFrame, keys: Seq[String]): DataFrame = {
    val a = approx.select(keys.map(col): _*).withColumn("in_a", lit(1))
    val e = exact.select(keys.map(col): _*).withColumn("in_e", lit(1))
    a.join(e, keys, "full_outer")
      .agg(
        count(col("in_e")).as("n_exact"),
        count(col("in_a")).as("n_approx"),
        count(when(col("in_a").isNotNull && col("in_e").isNotNull, 1)).as("n_hits"))
      .withColumn("recall",
        when(col("n_exact") > 0,
          col("n_hits").cast("double") / col("n_exact")).otherwise(lit(0.0)))
  }
}
