package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.VectorIngest

/** Vector-ingest contract: bootstrap trains frozen centroids, appends
  * cluster against them, the materialized index answers queries
  * exactly as the composed operators would, and replays are
  * idempotent. */
class VectorIngestSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val emb = Tables.embeddings(spark, SparkTestSession.sf)

  test("bootstrap + append: index equals frozen-centroid composition; queries match") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_vec_idx").toString
    val wave1 = emb.filter($"vec_id" < 250)
    val wave2 = emb.filter($"vec_id" >= 250)
    VectorIngest.processBatch(wave1, outDir, 0L)
    VectorIngest.processBatch(wave2, outDir, 1L)

    val idx = VectorIngest.readIndex(spark, outDir).get
    // centroids are wave-1's deterministic training, frozen
    val expCents = Similarity.ivfBuildIndex(wave1).centroids
      .collect().map(_.toSeq).toSet
    assert(idx.centroids.collect().map(_.toSeq).toSet == expCents)
    // every vector is in exactly one list
    assert(idx.lists.count() == emb.count())
    assert(idx.lists.select("vid").distinct().count() == emb.count())
    // queries against the materialized index == the composed
    // frozen-centroid expectation over the full corpus
    val queries = emb.filter($"vec_id" < 10)
    val got = VectorIngest.topK(spark, outDir, queries, k = 10)
      .collect().map(_.toSeq).toSet
    val expIdx = Similarity.IvfIndex(
      Similarity.ivfBuildIndex(wave1).centroids,
      Similarity.ivfAssign(Similarity.ivfBuildIndex(wave1).centroids,
        emb.select($"vec_id".as("vid"), $"embedding".as("cv"))))
    val exp = Similarity.ivfTopKIndexed(expIdx, queries, k = 10)
      .collect().map(_.toSeq).toSet
    assert(got == exp)
  }

  test("append replay is idempotent against the frozen centroids") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_vec_rep").toString
    VectorIngest.processBatch(emb.filter($"vec_id" < 250), outDir, 0L)
    VectorIngest.processBatch(emb.filter($"vec_id" >= 250), outDir, 1L)
    val once = VectorIngest.readIndex(spark, outDir).get.lists
      .collect().map(_.toSeq).toSet
    // crash-replay of both batches in order
    VectorIngest.processBatch(emb.filter($"vec_id" < 250), outDir, 0L)
    VectorIngest.processBatch(emb.filter($"vec_id" >= 250), outDir, 1L)
    val twice = VectorIngest.readIndex(spark, outDir).get.lists
      .collect().map(_.toSeq).toSet
    assert(once == twice)
  }

  test("PQ ingest: bootstrap freezes coarse+codebook tables, appends encode against them, replay idempotent") {
    graft.ops.Memo.clear(spark)
    val outDir = java.nio.file.Files.createTempDirectory("graft_vec_pq").toString
    val wave1 = emb.filter($"vec_id" < 250)
    val wave2 = emb.filter($"vec_id" >= 250)
    VectorIngest.processBatchPq(wave1, outDir, 0L, nlist = 16, m = 4, ksub = 8)
    VectorIngest.processBatchPq(wave2, outDir, 0L + 1, nlist = 16, m = 4, ksub = 8)

    val idx = VectorIngest.readPqIndex(spark, outDir).get
    // the codebook handle is self-describing: dials recovered from the
    // persisted table
    assert(idx.codebook.m == 4 && idx.codebook.ksub <= 8)
    // every vector has exactly m code rows
    assert(idx.codes.count() == emb.count() * 4)
    assert(idx.codes.select("vid").distinct().count() == emb.count())

    // queries against the materialized index == the composed
    // frozen-table expectation over the full corpus
    graft.ops.Memo.clear(spark)
    val queries = emb.filter($"vec_id" < 10)
    val got = VectorIngest.topKPq(spark, outDir, queries, emb, k = 10,
      nprobe = 8, rerank = 40).collect().map(_.toSeq).toSet
    val boot = Similarity.ivfPqBuild(wave1, nlist = 16, m = 4, ksub = 8)
    val expIdx = Similarity.IvfPqIndex(boot.centroids, boot.codebook,
      Similarity.ivfPqAssign(boot.centroids, boot.codebook, emb))
    val exp = Similarity.ivfPqTopK(expIdx, queries, emb, k = 10,
      nprobe = 8, rerank = 40).collect().map(_.toSeq).toSet
    assert(got == exp)

    // crash-replay of both batches: bit-identical code rows
    val once = idx.codes.collect().map(_.toSeq).toSet
    VectorIngest.processBatchPq(wave1, outDir, 0L, nlist = 16, m = 4, ksub = 8)
    VectorIngest.processBatchPq(wave2, outDir, 1L, nlist = 16, m = 4, ksub = 8)
    val twice = VectorIngest.readPqIndex(spark, outDir).get.codes
      .collect().map(_.toSeq).toSet
    assert(once == twice)
  }

  test("PQ bootstrap crash-replay: centroids are the commit marker — a partial bootstrap (codebook written, marker not) retrains instead of failing") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_vec_crash").toString
    val wave1 = emb.filter($"vec_id" < 250)
    VectorIngest.processBatchPq(wave1, outDir, 0L, nlist = 16, m = 4, ksub = 8)
    // simulate the only crash-reachable partial state under the
    // codebook-before-marker write order: codebook persisted, centroid
    // commit marker not (the inverse order left marker-present/
    // codebook-missing, where every replay died in readCodebook)
    val conf = spark.sessionState.newHadoopConf()
    val cent = new org.apache.hadoop.fs.Path(s"$outDir/pqindex/centroids")
    val fs = cent.getFileSystem(conf)
    assert(fs.delete(cent, true))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/pqindex/codebook")))
    // replay must take the TRAIN branch and leave a whole, queryable index
    VectorIngest.processBatchPq(wave1, outDir, 0L, nlist = 16, m = 4, ksub = 8)
    val idx = VectorIngest.readPqIndex(spark, outDir).get
    assert(idx.centroids.select("cid").distinct().count() == 16L)
    assert(idx.codes.select("vid").distinct().count() == wave1.count())
  }

  test("ivfTopKIndexed over ivfBuildIndex is exactly ivfTopK (the refactor contract)") {
    val queries = emb.filter($"vec_id" < 10)
    val direct = Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val viaIndex = Similarity.ivfTopKIndexed(
        Similarity.ivfBuildIndex(emb, nlist = 16), queries, k = 10, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(direct == viaIndex)
  }
}
