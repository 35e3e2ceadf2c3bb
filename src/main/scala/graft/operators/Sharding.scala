package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-shaping operators for training-data pipelines: token-budget
  * sharding (pack documents into shards of ~N tokens for tokenizer /
  * trainer workers) and per-source stratified sampling (data mixing).
  */
object Sharding {

  /** Assign each document a shard id such that consecutive documents
    * (by `orderCol`, within `partitionCol`) accumulate to roughly
    * `tokenBudget` tokens per shard.
    *
    * Scale: the running sum windows per `partitionCol` (source, dump,
    * crawl segment…), so no global single-partition window appears —
    * sequential packing is inherently per-stream, and streams are the
    * natural parallel unit. */
  def tokenBudgetShards(docs: DataFrame, tokenBudget: Long,
                        partitionCol: String = "source",
                        orderCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // integer division (`div`), not double-divide-then-cast: double
      // casts truncate in Spark but ROUND in DuckDB
      .withColumn("shard_id", expr(s"(cum_tokens - 1) div $tokenBudget"))
  }

  /** Per-stratum sampling fractions (data mixing): deterministic under
    * a fixed seed. Sampling is engine-internal randomness — pin with
    * property tests (fraction tolerance), not cross-engine oracles. */
  def stratifiedSample(docs: DataFrame, fractions: Map[String, Double],
                       strataCol: String = "source", seed: Long = 42L): DataFrame =
    docs.stat.sampleBy(strataCol, fractions, seed)

  /** Content-hash Bernoulli sample: keep a row iff
    * xxhash64(id, seed) mod 1e6 < fraction·1e6.
    *
    * Unlike `sample()`/`sampleBy()` — whose kept set depends on the
    * partition layout, so a repartition or cluster resize silently
    * changes WHICH rows survive — the decision here is a pure function
    * of (id, seed): stable across partitionings, executors, reruns,
    * and engine versions. At 100 TB that stability is the difference
    * between a reproducible data recipe and one that shifts under
    * every infra change. Per-row filter, no shuffle. */
  def hashSample(docs: DataFrame, fraction: Double,
                 idCol: String = "doc_id", seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    // round, don't truncate: 0.3 * 1e6 is 299999.99999... in binary
    // floating point, and toLong would make the effective threshold
    // 299999 — a systematic ~1e-6 under-sample vs the nominal fraction
    docs.filter(
      pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)) <
        lit(math.round(fraction * 1000000.0)))
  }
}
