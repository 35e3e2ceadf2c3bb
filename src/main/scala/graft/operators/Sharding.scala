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

  /** Sequence packing for pretraining: concatenate each stream's
    * documents (by `orderCol`, within `partitionCol`) into one virtual
    * token tape and cut it every `seqLen` tokens — the classic
    * concat-and-chunk packer that feeds fixed-context trainers with
    * zero padding waste. Output is one row per (document, sequence)
    * FRAGMENT: a doc shorter than the remaining capacity lands whole;
    * a doc spanning a cut point is split across consecutive sequences
    * (`frag_start`/`frag_len` are token offsets within the doc,
    * `seq_offset` is the fragment's position inside its sequence).
    *
    * All outputs are integer arithmetic over an exclusive running sum,
    * so the packing is a pure function of (stream, order) — stable
    * across partitionings and engines, per the repo's determinism
    * rules for data recipes.
    *
    * Scale: the running sum windows per `partitionCol` stream, the
    * natural parallel unit (same shape as [[tokenBudgetShards]]); the
    * fragment explode emits ≤ 1 + n_tokens/seqLen rows per doc. No
    * global window, no shuffle beyond the per-stream sort.
    *
    * When one stream dominates the corpus (a single crawl source can
    * be most of 100 TB), a per-stream window is one task — set
    * `substreamDocs = Some(S)` to cut each stream into blocks of S
    * consecutive `orderCol` ids, each packed as its own tape (the tape
    * flushes at block boundaries: the last sequence of each block is
    * allowed to run short, exactly like the stream's natural end).
    * Block membership is `orderCol div S` — deterministic, no extra
    * scan — so the parallel unit is bounded at ≤ S docs regardless of
    * stream skew. */
  def packSequences(docs: DataFrame, seqLen: Long,
                    partitionCol: String = "source",
                    orderCol: String = "doc_id",
                    substreamDocs: Option[Long] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(substreamDocs.forall(_ > 0), "substreamDocs must be positive")
    // a constant substream (None) keeps the whole stream as one tape;
    // the constant key changes nothing about the window's groups.
    // call_function("div", ...), not an expr() splice — `orderCol` is a
    // caller-supplied column name
    val sub = substreamDocs
      .map(s => call_function("div", col(orderCol), lit(s))).getOrElse(lit(0L))
    val w = Window.partitionBy(col(partitionCol), col("_substream"))
      .orderBy(orderCol).rowsBetween(Window.unboundedPreceding, -1)
    val frags = docs
      .withColumn("_substream", sub)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("n_tokens") > 0)
      // sequences this doc overlaps: floor(start/L) .. floor(last/L);
      // seq_id restarts per tape, so with substreams a sequence's
      // identity is (partitionCol, substream, seq_id)
      .withColumn("seq_id", explode(sequence(
        call_function("div", col("start_tok"), lit(seqLen)),
        call_function("div",
          col("start_tok") + col("n_tokens") - lit(1L), lit(seqLen)))))
      .withColumn("cut_lo", greatest(col("seq_id") * seqLen, col("start_tok")))
      .withColumn("cut_hi",
        least((col("seq_id") + lit(1L)) * seqLen, col("start_tok") + col("n_tokens")))
    val base = Seq(
      col(partitionCol), col(orderCol), col("seq_id"),
      (col("cut_lo") - col("start_tok")).as("frag_start"),
      (col("cut_hi") - col("cut_lo")).as("frag_len"),
      pmod(col("cut_lo"), lit(seqLen)).as("seq_offset"))
    if (substreamDocs.isDefined)
      frags.select(base.patch(1, Seq(col("_substream").as("substream")), 0): _*)
    else frags.select(base: _*)
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

  /** Deterministic train/val/test split assignment: each row maps to
    * exactly one split as a pure function of (id, seed) — the
    * content-hash stance of [[hashSample]], extended from keep/drop to
    * a partition of the corpus. A 100 TB recipe must be able to
    * regenerate the exact same holdout after any repartition, engine
    * upgrade, or backfill; anything derived from row position or
    * `rand()` cannot.
    *
    * The bucket is the FIRST HEX CHARACTER of the seed-keyed md5 (the
    * [[orderKey]] portability stance): hex digits are single-byte
    * ASCII, so the `< 'c'` / `< 'e'` comparisons replay identically on
    * any engine or collation that orders ASCII — no engine-specific
    * hex-to-int parsing in the contract. 16 buckets → 12/2/2 =
    * 75% / 12.5% / 12.5%. Per-row projection, zero shuffle. */
  def assignSplits(docs: DataFrame, idCol: String = "doc_id",
                   seed: Long = 42L): DataFrame = {
    val h = substring(md5(concat_ws(":", col(idCol).cast("string"),
      lit(seed.toString))), 1, 1)
    docs.withColumn("split",
      when(h < "c", "train").when(h < "e", "val").otherwise("test"))
  }

  /** The seed-keyed md5 order key both [[trainOrder]] and
    * [[temperatureMix]] sort by — ONE definition so the documented
    * "same order" contract between them is compile-time coupling, not
    * a copy. md5, not xxhash64, so any engine can replay the exact
    * order (the portability stance of [[hashSample]]'s documented
    * alternative). */
  private def orderKey(idCol: String, seed: Long) =
    md5(concat_ws(":", col(idCol).cast("string"), lit(seed.toString)))

  /** Temperature-weighted source mixing (α = 0.5): per-group quota
    * ∝ √(group size) instead of ∝ size — the standard flattening used
    * to keep small languages/sources represented in an LLM mix (pure
    * proportional sampling starves them; uniform over-samples noise).
    *
    * Every step is integer-exact so the kept set is reproducible on
    * any engine or cluster shape: weights are ⌊√n⌋ (exact — IEEE sqrt
    * is correctly rounded and its floor at these magnitudes cannot
    * straddle an integer), quotas are integer division
    * (budget·w) div Σw, and the picks are the first `quota` docs per
    * group under the seed-keyed md5 order [[trainOrder]] uses —
    * deterministic "random", no RNG state.
    *
    * Scale shape: group weights are one tiny aggregate broadcast back
    * (never collected); the per-group pick is one window over the
    * group partition. Groups are the parallel unit, as in
    * [[tokenBudgetShards]]. */
  def temperatureMix(docs: DataFrame, budget: Long,
                     groupCol: String = "lang", seed: Long = 42L,
                     idCol: String = "doc_id"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    // NULL-group rows are excluded from the WHOLE computation, not just
    // the final equi-join: without this filter they'd count into the
    // weights (deducting quota from the budget) while the null-dropping
    // join below could never spend it — budget silently lost to a group
    // that can't be picked. A mix over docs with unlabeled rows must
    // label them first (or mix on a non-null bucketing column).
    val grouped = docs.filter(col(groupCol).isNotNull)
    val weights = grouped.groupBy(groupCol)
      .agg(count(lit(1)).as("n_grp"))
      .withColumn("w_grp", floor(sqrt(col("n_grp").cast("double"))).cast("long"))
    val total = weights.agg(sum(col("w_grp")).as("tot_w"))
    val quotas = weights.crossJoin(broadcast(total))
      .withColumn("quota", expr(s"(${budget}L * w_grp) div tot_w"))
      .select(col(groupCol), col("quota"))
    val pick = Window.partitionBy(groupCol)
      .orderBy(col("okey"), col(idCol))
    grouped
      .withColumn("okey", orderKey(idCol, seed))
      .withColumn("pick_rank", row_number().over(pick).cast("long"))
      .join(broadcast(quotas), Seq(groupCol))
      .filter(col("pick_rank") <= col("quota"))
      .select(col(idCol), col(groupCol), col("pick_rank"))
  }

  /** Reproducible training order: a seed-keyed pseudo-random
    * permutation of the corpus ([[orderKey]]), bucketed into `nShards`
    * reader shards. Change the seed, get an independent permutation;
    * rerun the job on any cluster size, get the SAME one (the
    * reproducibility property a training run needs for
    * resume/ablation).
    *
    * Scale shape: shard assignment is a narrow map (two hex nibbles of
    * the key → bucket mod nShards — no global sort, no skew: buckets
    * are uniform by construction). The per-shard position is a window
    * keyed BY shard, so parallelism equals nShards — size nShards to
    * the reader fleet, not below the cluster's cores, and the wide
    * stage stays balanced. A global row_number (parallelism 1) never
    * appears. */
  def trainOrder(docs: DataFrame, nShards: Int, seed: Long = 42L,
                 idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1 && nShards <= 256, s"nShards must be in [1,256]: $nShards")
    val hex = "0123456789abcdef"
    val okey = orderKey(idCol, seed)
    val bucket =
      (call_function("locate", substring(col("okey"), 1, 1), lit(hex)) - lit(1))
        .cast("long") * lit(16L) +
      (call_function("locate", substring(col("okey"), 2, 1), lit(hex)) - lit(1))
        .cast("long")
    docs
      .withColumn("okey", okey)
      .withColumn("shard", pmod(bucket, lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("okey"), col(idCol))).cast("long"))
  }
}
