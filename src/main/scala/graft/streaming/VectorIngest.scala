package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Continuous embedding ingest — the similarity-pillar counterpart of
  * [[CorpusIngest]]: vector files land in a directory; the first batch
  * trains the IVF centroids (seeded sample + bounded Lloyd, exactly
  * [[Similarity.ivfBuildIndex]]), every batch clusters its vectors
  * against the FROZEN centroid table and appends posting-list rows.
  * Queries run [[Similarity.ivfTopKIndexed]] over the materialized
  * index — no retraining, no corpus re-scan, per-batch cost is one
  * broadcast-assign pass over the batch.
  *
  * Replay is idempotent without special-casing: a bootstrap replay
  * retrains the same deterministic centroids from the same batch and
  * overwrites; an append replay re-assigns against the same frozen
  * centroids and overwrites its own `ingest_batch` partition.
  *
  * Assumes unique vec_ids across batches (compose with the dedup
  * pillar upstream); centroid drift under a shifting distribution is
  * the documented retrain trigger — rebuild the index offline and swap
  * directories, queries never pay for it.
  */
object VectorIngest {

  def processBatch(batch: DataFrame, outDir: String, batchId: Long,
                   nlist: Int = 32, lloydIters: Int = 2, seed: Long = 42L,
                   idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    val centPath = s"$outDir/index/centroids"
    val listsPath = s"$outDir/index/lists"
    // bootstrap training reads the batch several times (seed draw,
    // Lloyd sample, assignment) — pin it so each pass reads the cache,
    // not the source files again
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecs = pinned.select(col(idCol).as("vid"), col(vecCol).as("cv"))
    val lists =
      if (!pathExists(spark, centPath)) {
        // bootstrap: train on this batch, freeze the centroids
        val idx = Similarity.ivfBuildIndex(pinned, nlist, lloydIters, seed,
          idCol, vecCol)
        idx.centroids.write.mode("overwrite").parquet(centPath)
        idx.lists
      } else
        Similarity.ivfAssign(spark.read.parquet(centPath), vecs)
    lists.write.mode("overwrite")
      .parquet(s"$listsPath/ingest_batch=$batchId")
    pinned.unpersist(blocking = false)
  }

  /** The materialized index, or None before the bootstrap batch. */
  def readIndex(spark: SparkSession, outDir: String): Option[Similarity.IvfIndex] = {
    val centPath = s"$outDir/index/centroids"
    val listsPath = s"$outDir/index/lists"
    if (!pathExists(spark, centPath) || !pathExists(spark, listsPath)) None
    else Some(Similarity.IvfIndex(
      spark.read.parquet(centPath),
      spark.read.parquet(listsPath).drop("ingest_batch")))
  }

  /** Top-k against the materialized index. */
  def topK(spark: SparkSession, outDir: String, queries: DataFrame, k: Int,
           nprobe: Int = 4,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.ivfTopKIndexed(
      readIndex(spark, outDir).getOrElse(
        throw new IllegalStateException(s"no IVF index at $outDir/index")),
      queries, k, nprobe, idCol, vecCol)

  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  /** Start the ingest stream over a landing directory of embedding
    * parquet files; AvailableNow turns it into a scheduled
    * incremental indexer (same stance as [[CorpusIngest.start]]). */
  def start(spark: SparkSession, inDir: String, outDir: String,
            schema: org.apache.spark.sql.types.StructType,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, outDir, id)
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .start()
}
