package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins. AQE's skew-join handles sort-merge skew
  * automatically at runtime; explicit salting remains the tool when a
  * hot key dominates a shuffled join badly enough that one task gets
  * ~all the data (the classic 100 TB failure mode: one straggler task
  * holding the job).
  */
object Skew {

  /** Salted equi-join: the fact side spreads each key over `buckets`
    * salt values (deterministically, by hashing `saltBy`), the
    * dimension side is replicated `buckets` times; the join key becomes
    * (key, salt) so a hot key's rows land on `buckets` tasks instead
    * of one. Result is row-identical to `fact.join(dim, keys)`.
    *
    * Cost model: dim side grows ×buckets — use only when dim is small
    * relative to the hot key's row count (else prefer AQE skew join).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltBy: Column, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(lit((0L until buckets.toLong).toArray)))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }

  /** Salted EXACT distinct count per key — the aggregation-side skew
    * tool. Plain sums/counts don't need salting (map-side partial
    * aggregation already spreads them), but a hot key's DISTINCT state
    * is one giant hash set on one task. Salting by a hash OF THE
    * COUNTED VALUE partitions the value space disjointly, so the
    * per-(key, salt) distinct counts are exact partials and their sum
    * is the exact answer — a hot key's state now lives on `buckets`
    * tasks. (This is the manual form of the Expand-based distinct
    * rewrite Catalyst plans; explicit when you need to pick the
    * fan-out or combine it with other partial aggregates.)
    *
    * Result is row-identical to
    * `df.groupBy(key).agg(countDistinct(value))`. */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
                          buckets: Int): DataFrame = {
    require(buckets > 0)
    df
      .withColumn("__salt", pmod(xxhash64(col(value)), lit(buckets.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct"))
  }
}
