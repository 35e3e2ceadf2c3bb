package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Md5Key

/** Bounded-state cardinality sketching as a reusable operator — the
  * generic form of q141, shared verbatim by the batch query and the
  * streaming view because the plan is the same declarative aggregate
  * either way.
  *
  * Streaming is the point of the design: a KMV sketch's state is
  * [[graft.functions.BoundedMinKDistinct]]'s k-capped set buffer, and
  * Structured Streaming keeps exactly that buffer per group in the
  * state store, merging each micro-batch's partial through the
  * aggregate's own `merge` — so a continuously-maintained distinct
  * estimate costs O(k) state per group FOREVER, where streaming
  * `approx_count_distinct` state is engine-opaque and exact streaming
  * `countDistinct` is unsupported precisely because its state is
  * unbounded. Set semantics across micro-batches come for free: a
  * value re-arriving in a later batch hashes to an already-held
  * minimum and the buffer doesn't move.
  */
object Sketches {

  /** Per-group KMV distinct-cardinality estimate over `idCol`
    * (any SQL expression yielding a stable string/number per element).
    *
    * Batch: call on any DataFrame. Streaming: call on a streaming
    * DataFrame and write with Complete (or Update) output mode — the
    * result is the continuously-maintained estimate per group.
    *
    * Output: `n_heads` (≤ k), `kth_hash` (NULL below k),
    * `est_distinct` — exact below k, else `(k−1)·2⁶⁰ div h_k`
    * ([[Md5Key]] hash space; Beyer et al. SIGMOD'07). All integer
    * arithmetic, so the batch form sits under the DuckDB hash gate
    * (q141's oracle) and the streaming form equals it row-for-row. */
  def kmvDistinctEstimate(df: DataFrame, groupCol: String, idCol: String,
                          k: Int = 64): DataFrame = {
    graft.functions.BoundedMinKDistinct.register(df.sparkSession)
    df
      .select(col(groupCol),
        expr(s"substr(md5(cast($idCol as string)), 1, 15)").as("hx"))
      .withColumn("hv", expr(Md5Key.hex15ToLong("hx")))
      .groupBy(groupCol)
      .agg(expr(s"bounded_min_k_distinct(hv, $k)").as("hs"))
      .select(col(groupCol),
        size(col("hs")).cast("long").as("n_heads"),
        expr(s"CASE WHEN size(hs) = $k THEN element_at(hs, $k) END")
          .as("kth_hash"),
        expr(s"CASE WHEN size(hs) < $k THEN cast(size(hs) as bigint) " +
          s"ELSE cast(cast(${k - 1} as decimal(19,0)) * ${Md5Key.Space} " +
          s"div greatest(element_at(hs, $k), 1) as bigint) END")
          .as("est_distinct"))
  }
}
