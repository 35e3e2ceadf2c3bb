package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.operators.{Dedup, Sharding, TextAnalysis}

/** CLI orchestrator for the training-corpus pipeline — the extension
  * suite's counterpart to [[TbMain]]'s parity pipeline: the flagship
  * composition (clean → exact dedup → MinHash-LSH near-dup → connected
  * components → deterministic sample → token-budget shards) drivable
  * end-to-end from one entry point: parquet in, cleaned sharded corpus
  * + a stage-count report out.
  *
  * Usage: CorpusMain <docsParquet> <outDir> [sampleFraction] [seqLen]
  * [pruneChunkTokens]
  *
  * Every stage is the scale-shaped variant (see the operator docs):
  * the clean filters are per-row codegen'd expressions, exact dedup is
  * one O(n) hash pass, near-dup candidates come from LSH buckets
  * (never O(n²)), the sample is a partition-independent content-hash
  * Bernoulli, and sharding is a per-source window. The output is
  * partitioned by shard_id so a training reader can take whole shards
  * (≈ tokenBudget tokens each) as its unit of work.
  */
object CorpusMain {

  case class Report(nInput: Long, nCleaned: Long, nDeduped: Long,
                    nSampled: Long, nShards: Long, totalTokens: Long,
                    nSequences: Long = 0L, nFragments: Long = 0L,
                    nScrubDropped: Long = 0L)

  /** The pipeline body, separated from `main` so a spec can run it on
    * an existing session and compare the report against the composed
    * operators. Stage counts are report-only actions; `deduped` is
    * persisted because three consumers read it (its own count, the
    * sample, the write) and the LSH+CC chain is the expensive leg.
    *
    * Input is parquet with (doc_id, text, source, ...) columns, or a
    * raw text dump (`.txt` — one document per line) ingested through
    * [[graft.sources.Sources.textLines]] with content-addressed ids. */
  def run(spark: SparkSession, docsParquet: String, outDir: String,
          sampleFraction: Double = 1.0,
          minTokens: Int = 20, maxTokens: Int = 100000,
          minQuality: Double = 0.5, maxTopBigramRatio: Double = 0.2,
          langs: Seq[String] = Seq("en"),
          k: Int = 3, numHashes: Int = 16, bands: Option[Int] = None,
          threshold: Double = 0.6, tokenBudget: Long = 5000L,
          seqLen: Option[Long] = None,
          prunePassageTokens: Option[Int] = None): Report = {
    val docs = (if (docsParquet.endsWith(".txt"))
        graft.sources.Sources.textLines(spark, docsParquet)
      else spark.read.parquet(docsParquet))
      .repartition(spark.sparkContext.defaultParallelism)
    val nInput = docs.count()

    // Phase 1 — clean: keep ids from the composed recipe, semi-join the
    // full rows back (cleanCorpus returns signals, the corpus keeps its
    // original columns)
    val keepIds = TextAnalysis.cleanCorpus(docs, minTokens, maxTokens,
      minQuality, maxTopBigramRatio, langs).select("doc_id")
    val cleaned = docs.join(keepIds, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCleaned = cleaned.count()
    println(s"[clean] $nInput -> $nCleaned docs " +
      s"(tokens in [$minTokens,$maxTokens], quality >= $minQuality, " +
      s"langs ${langs.mkString("/")}, top-bigram <= $maxTopBigramRatio)")

    // Phase 2 — dedup: exact pass, LSH near-dup pairs, connected
    // components, one representative per component
    val deduped = Dedup.dedupCorpus(cleaned, k, numHashes, bands, threshold)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDeduped = deduped.count()
    println(s"[dedup] $nCleaned -> $nDeduped docs (exact + minhash-LSH @ j>=$threshold)")

    // Phase 2.5 (optional) — passage-level scrub: doc-level dedup
    // can't see boilerplate chunks shared by otherwise-unique docs;
    // prunePassages keeps each distinct chunk's globally-first
    // occurrence and rebuilds the text. Docs whose every chunk was a
    // repeat drop out (their content survives elsewhere).
    val (scrubbed, nScrubbed) = prunePassageTokens match {
      case Some(ct) =>
        val pruned = TextAnalysis.prunePassages(deduped, chunkTokens = ct)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("pruned_text"))
        // persisted like `deduped`: the chunk-window chain would
        // otherwise re-run for every downstream consumer (count,
        // sample, write)
        val rebuilt = deduped.drop("text").join(pruned, Seq("doc_id"))
          .withColumnRenamed("pruned_text", "text")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val n = rebuilt.count()
        println(s"[passages] $nDeduped -> $n docs after passage-level " +
          s"scrub ($ct-token chunks)")
        (rebuilt, n)
      case None => (deduped, nDeduped)
    }

    // Phase 3 — deterministic sample (content-hash Bernoulli: the kept
    // set is a pure function of ids, stable across partitionings)
    val sampled =
      if (sampleFraction >= 1.0) scrubbed
      else Sharding.hashSample(scrubbed, sampleFraction)
    val nSampled = sampled.count()
    println(s"[sample] $nScrubbed -> $nSampled docs (fraction $sampleFraction)")

    // Phase 4 — token-budget shards, written partitioned by shard so a
    // consumer reads whole ≈tokenBudget-token units
    val sharded = Sharding.tokenBudgetShards(sampled, tokenBudget)
    sharded.write.mode("overwrite").partitionBy("shard_id")
      .parquet(s"$outDir/corpus")
    // shard/token totals off the WRITTEN files — verifies the artifact
    // a consumer will read, and costs one scan of the output instead of
    // re-running the pipeline
    val out = spark.read.parquet(s"$outDir/corpus")
    val r = out.agg(
      org.apache.spark.sql.functions.countDistinct("shard_id"),
      org.apache.spark.sql.functions.sum("n_tokens")).first()
    println(s"[shard] ${r.getLong(0)} shards, ${r.getLong(1)} tokens " +
      s"-> $outDir/corpus")

    // Phase 5 (optional) — sequence packing: cut each source stream's
    // token tape every seqLen tokens for fixed-context trainers. The
    // fragment table is written beside the shard output (same corpus,
    // two consumption shapes: whole shards for tokenizer workers,
    // packed sequences for the trainer).
    val (nSeqs, nFrags) = seqLen match {
      case Some(l) =>
        Sharding.packSequences(sampled, l)
          .write.mode("overwrite").parquet(s"$outDir/sequences")
        val p = spark.read.parquet(s"$outDir/sequences")
        val s = p.agg(
          org.apache.spark.sql.functions.count_distinct(
            org.apache.spark.sql.functions.col("source"),
            org.apache.spark.sql.functions.col("seq_id")),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1))).first()
        println(s"[pack] ${s.getLong(0)} sequences of $l tokens " +
          s"(${s.getLong(1)} doc fragments) -> $outDir/sequences")
        (s.getLong(0), s.getLong(1))
      case None => (0L, 0L)
    }

    val report = Report(nInput, nCleaned, nDeduped, nSampled,
      r.getLong(0), r.getLong(1), nSeqs, nFrags,
      nScrubDropped = nDeduped - nScrubbed)

    import spark.implicits._
    Seq(report).toDS().write.mode("overwrite").parquet(s"$outDir/report")
    cleaned.unpersist(blocking = false)
    deduped.unpersist(blocking = false)
    if (!(scrubbed eq deduped)) scrubbed.unpersist(blocking = false)
    report
  }

  /** Usage: CorpusMain [docsParquet] [outDir] [sampleFraction] [seqLen]
    * [pruneChunkTokens] — seqLen/pruneChunkTokens of 0 disable those
    * stages. */
  def main(args: Array[String]): Unit = {
    val input = args.lift(0).getOrElse("/root/testdata/sf0.001/documents.parquet")
    val outDir = args.lift(1).getOrElse("/tmp/corpus_out")
    val fraction = args.lift(2).map(_.toDouble).getOrElse(1.0)
    val seqLen = args.lift(3).map(_.toLong).filter(_ > 0)
    val pruneTokens = args.lift(4).map(_.toInt).filter(_ > 0)
    val spark = GraftSession.create(appName = "graft-corpus",
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
    spark.sparkContext.setLogLevel("WARN")
    val report = run(spark, input, outDir, fraction, seqLen = seqLen,
      prunePassageTokens = pruneTokens)
    println(s"""{"n_input":${report.nInput},"n_cleaned":${report.nCleaned},""" +
      s""""n_deduped":${report.nDeduped},"n_scrub_dropped":${report.nScrubDropped},""" +
      s""""n_sampled":${report.nSampled},""" +
      s""""n_shards":${report.nShards},"total_tokens":${report.totalTokens},""" +
      s""""n_sequences":${report.nSequences},"n_fragments":${report.nFragments}}""")
    spark.stop()
  }
}
