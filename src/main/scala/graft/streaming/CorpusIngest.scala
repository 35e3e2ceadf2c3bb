package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, TextAnalysis}

/** Continuous corpus ingest — the service form of [[graft.CorpusMain]]:
  * document files land in a directory, each micro-batch is cleaned,
  * deduped within itself, tested for novelty against everything
  * already ingested, and the survivors appended to the corpus. The
  * corpus is only ever grown by batch-local work (the deltaDedup
  * contract: delta×corpus joins, never corpus×corpus re-dedup), which
  * is what keeps per-batch cost flat as the corpus passes 100 TB.
  *
  * Exactly-once shape: each batch writes to its own
  * `ingest_batch=<id>` partition directory with overwrite — a batch
  * replay after a crash rewrites the same directory instead of
  * double-appending, so the sink is idempotent under the checkpoint's
  * at-least-once replay. Readers see one corpus table via partition
  * discovery (`spark.read.parquet(outDir/corpus)`).
  */
object CorpusIngest {

  /** One micro-batch: clean → in-batch dedup → delta-vs-corpus
    * novelty → idempotent partition write. Public so the spec can
    * drive single batches and compare against the composed operators. */
  def processBatch(batch: DataFrame, outDir: String, batchId: Long,
                   minTokens: Int = 20, maxTokens: Int = 100000,
                   minQuality: Double = 0.5, maxTopBigramRatio: Double = 0.2,
                   langs: Seq[String] = Seq("en"),
                   k: Int = 3, numHashes: Int = 16, bands: Option[Int] = None,
                   threshold: Double = 0.6,
                   maxShingleDocFreq: Option[Int] = None,
                   containmentPermille: Option[Long] = None): Unit = {
    val spark = batch.sparkSession
    // Several consumers (clean recipe, dedup legs, report counts) each
    // trigger actions over this micro-batch; unpersisted, every action
    // re-reads the batch's source files. Batch-sized, so
    // MEMORY_AND_DISK spills rather than OOMs.
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keepIds = TextAnalysis.cleanCorpus(pinned, minTokens, maxTokens,
      minQuality, maxTopBigramRatio, langs).select("doc_id")
    val cleaned = pinned.join(keepIds, Seq("doc_id"), "left_semi")
    // novelty WITHIN the batch first (deltaDedup's documented contract);
    // persisted because the novelty join, the write, and the report
    // count all consume it — the LSH+CC chain must not run three times
    val batchNovel = Dedup.dedupCorpus(cleaned, k, numHashes, bands, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusPath = s"$outDir/corpus"
    // Novelty is judged against the MATERIALIZED dedup index, not the
    // corpus text: per-batch cost reads (hash set + shingle index),
    // never re-shingles the accumulated corpus — the property that
    // keeps batch latency flat as the corpus grows.
    //
    // CRITICAL replay semantics: exclude THIS batch's partitions from
    // the index read. A crash-replay of batch N would otherwise see
    // its own previous output as "corpus", classify every doc as
    // non-novel, and overwrite the partition with an empty set —
    // silent data loss. The exclusion is a partition-pruned filter,
    // so the replayed directories are never even scanned.
    val existing = readIndexExcluding(spark, outDir, batchId)
    val novel = existing match {
      case Some(index) =>
        Dedup.deltaDedupIndexed(index, batchNovel, k, threshold,
          maxShingleDocFreq = maxShingleDocFreq,
          containmentPermille = containmentPermille)
      case None => batchNovel
    }
    novel.write.mode("overwrite")
      .parquet(s"$corpusPath/ingest_batch=$batchId")
    // Index maintenance: derive this batch's index rows from the
    // DURABLE partition just written (not the in-memory plan), so the
    // index always mirrors the corpus on disk; overwrite per batch id
    // keeps the replay idempotence of the corpus writes.
    val landed = spark.read.parquet(s"$corpusPath/ingest_batch=$batchId")
    val idx = Dedup.buildDedupIndex(landed, k)
    idx.hashes.write.mode("overwrite")
      .parquet(s"$outDir/index/hashes/ingest_batch=$batchId")
    idx.shingles.write.mode("overwrite")
      .parquet(s"$outDir/index/shingles/ingest_batch=$batchId")
    idx.counts.write.mode("overwrite")
      .parquet(s"$outDir/index/counts/ingest_batch=$batchId")
    // per-batch PARTIAL dfs (df over this batch's docs only): df is
    // additive over disjoint doc sets, so the reader sums partials —
    // appending stays batch-local work, the corpus-wide df is never
    // recomputed from the shingle table
    idx.dfs.write.mode("overwrite")
      .parquet(s"$outDir/index/dfs/ingest_batch=$batchId")
    // Per-batch observability: the stage funnel an operator watches to
    // catch drift (a cleaning recipe suddenly rejecting everything, a
    // batch that is all duplicates). Batch-sized counts, idempotent
    // like every other per-batch artifact; read the whole funnel with
    // spark.read.parquet(outDir/reports).
    import spark.implicits._
    Seq((pinned.count(), cleaned.count(), batchNovel.count(), landed.count()))
      .toDF("n_input", "n_cleaned", "n_batch_novel", "n_novel")
      .write.mode("overwrite")
      .parquet(s"$outDir/reports/ingest_batch=$batchId")
    batchNovel.unpersist(blocking = false)
    pinned.unpersist(blocking = false)
  }

  /** The accumulated corpus, or None before the first batch lands.
    * Partition discovery folds every ingest_batch directory into one
    * table; the partition column itself is provenance, not content. */
  /** Publish a read-optimized snapshot of the ingest corpus: the
    * append-oriented `ingest_batch` layout is replay-idempotent but
    * accrues one directory of smallish files per batch — the snapshot
    * rewrites it doc_id-sorted at ~`targetFileBytes` per file, so
    * per-file min/max ranges are disjoint and filtered reads prune
    * files (see [[graft.operators.Maintenance]]). Provenance stays in
    * the ingest log; the snapshot drops the partition column. Publish
    * to a NEW directory and swap — readers never see a half-written
    * table. Returns the snapshot row count. */
  def publishSnapshot(spark: SparkSession, outDir: String,
                      snapshotDir: String,
                      targetFileBytes: Long = 128L << 20): Long = {
    val corpus = readCorpus(spark, s"$outDir/corpus").getOrElse(
      throw new IllegalStateException(s"no corpus at $outDir/corpus"))
    val (_, bytes) =
      graft.operators.Maintenance.listParquet(spark, s"$outDir/corpus")
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    corpus
      .repartitionByRange(nOut, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(snapshotDir)
    // the publish overwrote snapshotDir: any plan-keyed memo entry
    // built over a prior read of it — in ANY session — is now stale
    // (Memo.frameKey's contract); entries rebuild on demand
    graft.ops.Memo.invalidatePath(snapshotDir)
    spark.read.parquet(snapshotDir).count()
  }

  /** Scheme-transparent existence probe (file://, hdfs://, ... — same
    * stance as the S12 fetch/serve paths). */
  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  /** A directory is a READABLE parquet table only if it holds at least
    * one footer — a dir whose every partition was excluded, compacted
    * away, or devolved (the straddle spec's dfs case) exists but makes
    * `spark.read.parquet` throw UNABLE_TO_INFER_SCHEMA. One recursive
    * driver-side listing, same cost class as the existence probe. */
  private def hasParquetData(spark: SparkSession, p: String): Boolean =
    pathExists(spark, p) &&
      graft.operators.Maintenance.listParquet(spark, p)._1 > 0

  def readCorpus(spark: SparkSession, corpusPath: String): Option[DataFrame] =
    if (!pathExists(spark, corpusPath)) None
    else {
      val df = spark.read.parquet(corpusPath)
      if (df.columns.contains("ingest_batch")) Some(df.drop("ingest_batch"))
      else Some(df)
    }

  /** The materialized dedup index as of BEFORE `batchId` (see the
    * replay note in [[processBatch]]). "No corpus yet" is decided by
    * the HASH table alone: every ingested doc has a content hash, so
    * an empty-after-exclusion hash set means first batch (or its
    * replay) — while an empty SHINGLE table beside a non-empty hash
    * set is a legitimate index (docs shorter than k tokens) and must
    * not disable the exact-dup filter. */
  private[graft] def readIndexExcluding(spark: SparkSession, outDir: String,
                                 batchId: Long): Option[Dedup.DedupIndex] = {
    val paths = Seq("hashes", "shingles", "counts", "dfs")
      .map(t => s"$outDir/index/$t")
    if (!paths.take(3).forall(hasParquetData(spark, _))) None
    else {
      def tbl(p: String) = spark.read.parquet(p)
        .filter(col("ingest_batch") =!= batchId)
        .drop("ingest_batch")
      val hashes = tbl(paths(0))
      import org.apache.spark.sql.functions.{count => cnt, lit, sum => fsum}
      // An index can STRADDLE the r7 denormalization: batches laid
      // down before it store shingle rows without the carried per-doc
      // count (`nc`) and wrote no `dfs` partials (the two shipped
      // together), while later batches have both. The vintage is
      // decided DRIVER-SIDE, one footer per batch directory (a batch
      // is written at once, so one file speaks for the directory) —
      // and the clean steady state (no legacy dirs) reads the table
      // through ONE branch with no union, no nc-IS-NULL scan, and no
      // legacy dfs leg: the straddle machinery must not tax every
      // post-upgrade ingest batch forever.
      val fsPath = new org.apache.hadoop.fs.Path(paths(1))
      val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
      val batchDirs = fs.listStatus(fsPath).toSeq
        .filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("ingest_batch="))
        .filterNot(_.getName == s"ingest_batch=$batchId")
        .filter(d => hasParquetData(spark, d.toString))
      if (batchDirs.isEmpty) None
      else {
        val (modernDirs, legacyDirs) = batchDirs.partition(d =>
          spark.read.parquet(d.toString).columns.contains("nc"))
        // legacy rows (the pre-r7 vintage) restore nc with a per-doc
        // window over ONLY themselves — a doc's rows all land in one
        // batch, so the legacy subset contains every row of its docs;
        // post-r7 rows never pay the shuffle (lazy; runs only if a
        // near-dup leg consumes it)
        val legacy =
          if (legacyDirs.isEmpty) None
          else Some(spark.read.parquet(legacyDirs.map(_.toString): _*))
        val legacyFilled = legacy.map(_.withColumn("nc",
          cnt(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("c_id"))))
        val modern =
          if (modernDirs.isEmpty) None
          else Some(spark.read.parquet(modernDirs.map(_.toString): _*))
        val shingles = (modern, legacyFilled) match {
          case (Some(m), Some(l)) => m.unionByName(l)
          case (Some(m), None) => m
          case (None, Some(l)) => l
          case (None, None) => throw new IllegalStateException("unreachable")
        }
        // corpus-wide df = sum of the per-batch partials PLUS the
        // legacy dirs' own counts — partials exist only for post-r7
        // batches, so summing them alone would undercount every
        // shingle the legacy prefix contains; an index with no dfs
        // table at all derives df wholly from the shingle rows (lazy,
        // capped path only, same as before). With no legacy dirs the
        // partials pass through un-unioned.
        val dfs =
          if (hasParquetData(spark, paths(3))) {
            val partials = tbl(paths(3)).select(col("shingle"), col("df"))
            legacy match {
              case None => partials.groupBy("shingle").agg(fsum("df").as("df"))
              case Some(l) => partials
                .unionByName(l.groupBy("shingle").agg(cnt(lit(1)).as("df")))
                .groupBy("shingle").agg(fsum("df").as("df"))
            }
          } else shingles.groupBy("shingle").agg(cnt(lit(1)).as("df"))
        if (hashes.isEmpty) None
        else Some(Dedup.DedupIndex(hashes, shingles, tbl(paths(2)), dfs))
      }
    }
  }

  /** Start the ingest stream over a landing directory of document
    * parquet files (schema must include doc_id/text/source).
    * `Trigger.AvailableNow` turns the same query into an incremental
    * batch ingester: each invocation processes exactly the files that
    * landed since the last checkpoint, then stops — the T1/T2
    * scheduled-re-run shape.
    *
    * The clean/dedup dials mirror [[processBatch]]'s signature (same
    * defaults) so a tuned deployment configures the stream entry point
    * directly instead of re-implementing it around processBatch. */
  def start(spark: SparkSession, inDir: String, outDir: String,
            schema: org.apache.spark.sql.types.StructType,
            trigger: Trigger = Trigger.AvailableNow(),
            minTokens: Int = 20, maxTokens: Int = 100000,
            minQuality: Double = 0.5, maxTopBigramRatio: Double = 0.2,
            langs: Seq[String] = Seq("en"),
            k: Int = 3, numHashes: Int = 16, bands: Option[Int] = None,
            threshold: Double = 0.6,
            maxShingleDocFreq: Option[Int] = None,
            containmentPermille: Option[Long] = None): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, outDir, id, minTokens, maxTokens,
          minQuality, maxTopBigramRatio, langs, k, numHashes, bands,
          threshold, maxShingleDocFreq, containmentPermille)
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .start()

  /** One micro-batch of WET archive FILES (`binaryFile` rows: path,
    * content) → (documents, quarantine) in the corpus schema — the
    * adapter both the streaming and batch archive legs share, so
    * stream ≡ batch holds by construction. Documents get a
    * deterministic `doc_id` (default: xxhash64 of archive path +
    * member offset — stable across replays and across the two legs;
    * pass `docId` to derive ids from the crawl's own conventions,
    * e.g. the fixture's `…/doc/<id>` URIs) and `source` = the archive
    * path. Quarantine rows keep full provenance for the dead-letter
    * sink — corruption is data on the streaming path too. */
  /** [[archiveBatchDocs]]'s result: document + dead-letter frames,
    * both reading the shared `pinned` member frame (unpersist it when
    * the batch's actions are done — the [[processBatch]] style). */
  final case class ArchiveBatch(docs: DataFrame, quarantine: DataFrame,
                                pinned: DataFrame)

  def archiveBatchDocs(archiveFiles: DataFrame,
                       docId: Option[org.apache.spark.sql.Column] = None,
                       maxMemberBytes: Long = graft.functions.GzipArchiveCore.MaxMemberBytes,
                       maxTotalBytes: Long = graft.functions.GzipArchiveCore.MaxTotalBytes,
                       sliced: Boolean = false): ArchiveBatch = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val arch = archiveFiles
      .select(col("path").as("archive"), col("content").as("payload"))
    // pinned: the gzip inflation + WARC parse feed the dead-letter
    // write AND processBatch's several actions — unpinned, each action
    // would re-inflate every archive.
    // `sliced` routes through the offset-splittable path: the member
    // index + per-member slices, so the caps bind PER SLICE and a
    // bigger-than-budget crawl file ingests completely on the
    // STREAMING leg too (same contract as the batch
    // wetDocumentsSliced).
    val recs = (if (sliced)
      graft.sources.WebArchive.wetDocumentsSliced(arch,
        maxMemberBytes = maxMemberBytes, maxTotalBytes = maxTotalBytes)
    else
      graft.sources.WebArchive.wetDocuments(arch,
        maxMemberBytes = maxMemberBytes, maxTotalBytes = maxTotalBytes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val id = docId.getOrElse(xxhash64(col("archive"), col("member_offset")))
    val docs = recs.filter(col("quarantine").isNull)
      .select(id.as("doc_id"), col("text"), col("archive").as("source"))
    val dead = recs.filter(col("quarantine").isNotNull)
      .select("archive", "member_index", "member_offset", "member_clen",
        "quarantine")
    ArchiveBatch(docs, dead, recs)
  }

  /** Continuous ingest over a landing directory of WET ARCHIVE files —
    * [[start]]'s shape with the WARC-gzip codec in front: each
    * micro-batch expands its archives to member rows
    * ([[graft.sources.WebArchive.wetDocuments]] — per-row expression
    * work, zero shuffles before the clean/dedup stages), routes
    * quarantine rows to an idempotent per-batch dead-letter partition
    * (`outDir/quarantine/ingest_batch=<id>`, the same overwrite
    * replay-safety as the corpus writes), and feeds the documents
    * through the exact [[processBatch]] pipeline. At 100 TB this is
    * the front door: crawl files land, docs flow, nothing corrupt is
    * silently dropped. */
  def startArchives(spark: SparkSession, inDir: String, outDir: String,
                    trigger: Trigger = Trigger.AvailableNow(),
                    minTokens: Int = 20, maxTokens: Int = 100000,
                    minQuality: Double = 0.5, maxTopBigramRatio: Double = 0.2,
                    langs: Seq[String] = Seq("en"),
                    k: Int = 3, numHashes: Int = 16, bands: Option[Int] = None,
                    threshold: Double = 0.6,
                    maxMemberBytes: Long = graft.functions.GzipArchiveCore.MaxMemberBytes,
                    maxTotalBytes: Long = graft.functions.GzipArchiveCore.MaxTotalBytes,
                    sliced: Boolean = false): StreamingQuery =
    spark.readStream
      .format("binaryFile")
      // binaryFile's schema is FIXED by the source, but the streaming
      // reader still demands it explicitly (no inference pass on a
      // stream) — this is that schema verbatim
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val ab = archiveBatchDocs(batch, None, maxMemberBytes,
          maxTotalBytes, sliced)
        ab.quarantine.write.mode("overwrite")
          .parquet(s"$outDir/quarantine/ingest_batch=$id")
        processBatch(ab.docs, outDir, id, minTokens, maxTokens,
          minQuality, maxTopBigramRatio, langs, k, numHashes, bands,
          threshold)
        ab.pinned.unpersist(blocking = false)
        () // foreachBatch wants Unit; unpersist returns the frame
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .start()

  /** The RANGE-READ continuous ingest — [[startArchives]] with the
    * whole-file residency removed from the STREAMING leg too: the
    * stream carries only file PATHS (the binaryFile source pruned to
    * `path`, so its content column is never required and a landed
    * 100 GB crawl file costs the stream a row, not its bytes), each
    * micro-batch stream-indexes its new files through the bounded
    * window ([[graft.sources.WebArchive.memberIndexFromPaths]]),
    * PERSISTS the index as an idempotent per-batch artifact — the
    * cluster.idx later ranged readers consume without re-scanning —
    * and ingests the members via per-member byte-range reads
    * ([[graft.sources.WebArchive.wetDocumentsRanged]]). Same document
    * shaping, dead-letter, and downstream clean/dedup pipeline as
    * [[startArchives]], so stream ≡ batch holds on this leg by the
    * same construction; the index read back from its own artifact
    * means the expensive indexing scan runs ONCE per batch however
    * many actions consume the records. */
  def startArchivesRanged(spark: SparkSession, inDir: String, outDir: String,
                          trigger: Trigger = Trigger.AvailableNow(),
                          minTokens: Int = 20, maxTokens: Int = 100000,
                          minQuality: Double = 0.5,
                          maxTopBigramRatio: Double = 0.2,
                          langs: Seq[String] = Seq("en"),
                          k: Int = 3, numHashes: Int = 16, bands: Option[Int] = None,
                          threshold: Double = 0.6,
                          maxMemberBytes: Long = graft.functions.GzipArchiveCore.MaxMemberBytes,
                          maxTotalBytes: Long = graft.functions.GzipArchiveCore.MaxTotalBytes,
                          maxSliceBytes: Long = graft.functions.FileRangeCore.MaxRangeBytes,
                          fanoutPartitions: Option[Int] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    spark.readStream
      .format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(inDir)
      .select(col("path")) // prune BEFORE foreachBatch: content never reads
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val ss = batch.sparkSession
        val idxPath = s"$outDir/member_index/ingest_batch=$id"
        graft.sources.WebArchive
          .memberIndexFromPaths(batch.select(col("path").as("archive")))
          .write.mode("overwrite").parquet(idxPath)
        val recs = graft.sources.WebArchive.wetDocumentsRanged(
          ss.read.parquet(idxPath),
          maxMemberBytes = maxMemberBytes, maxTotalBytes = maxTotalBytes,
          maxSliceBytes = maxSliceBytes, fanoutPartitions = fanoutPartitions)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        recs.filter(col("quarantine").isNotNull)
          .select("archive", "member_index", "member_offset", "member_clen",
            "quarantine")
          .write.mode("overwrite").parquet(s"$outDir/quarantine/ingest_batch=$id")
        val docs = recs.filter(col("quarantine").isNull)
          .select(xxhash64(col("archive"), col("member_offset")).as("doc_id"),
            col("text"), col("archive").as("source"))
        processBatch(docs, outDir, id, minTokens, maxTokens,
          minQuality, maxTopBigramRatio, langs, k, numHashes, bands,
          threshold)
        recs.unpersist(blocking = false)
        ()
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .start()
  }

  /** Usage: CorpusIngest <landingDir> <outDir> — processes every file
    * that landed since the last run's checkpoint (AvailableNow), then
    * prints the corpus size. Re-invoke on a schedule for incremental
    * ingest; leave a continuous trigger to [[start]] callers. */
  def main(args: Array[String]): Unit = {
    val inDir = args.lift(0).getOrElse("/tmp/corpus_landing")
    val outDir = args.lift(1).getOrElse("/tmp/corpus_ingest")
    val spark = graft.GraftSession.create(appName = "graft-corpus-ingest",
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
    spark.sparkContext.setLogLevel("WARN")
    // schema from the landed files themselves (one batch-read listing)
    val schema = spark.read.parquet(inDir).schema
    start(spark, inDir, outDir, schema).awaitTermination()
    val n = readCorpus(spark, s"$outDir/corpus").map(_.count()).getOrElse(0L)
    println(s"""{"corpus_docs":$n,"out":"$outDir/corpus"}""")
    spark.stop()
  }
}
