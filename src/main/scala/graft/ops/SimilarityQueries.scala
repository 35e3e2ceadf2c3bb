package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Similarity-search inventory over the `embeddings` fixture.
  * The brute-force baseline is oracle-backed (ranking ints only —
  * cosine last-ulp noise between engines must not reach the hash);
  * the LSH paths are rows-only + spec-pinned against the baseline.
  */
object SimilarityQueries {

  /** The embeddings fixture is one parquet row-group = one input
    * split; the 64-hyperplane projection is CPU-heavy per row, so
    * rebalance to the cores (no-op concern at real scale — see
    * TextQueries.docsRebalanced). */
  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)

  private def queryVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 10)

  /** Exact brute-force cosine top-10 for the first 10 vectors. */
  def q40CosineTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(
      corpus(spark, dir), queryVectors(spark, dir), k = 10)

  /** SRP-LSH approximate top-10, same contract (rows-only check). */
  def q41AnnTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.annTopK(
      corpus(spark, dir), queryVectors(spark, dir), k = 10)

  /** Embedding-cosine near-dup pairs via LSH (rows-only check). */
  def q42AnnNeardup(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(
      corpus(spark, dir), threshold = 0.4)
      .select(col("d1"), col("d2"))

  /** IVF-flat approximate top-10 — the density-adaptive ANN variant
    * (rows-only check; spec-pinned against brute force). */
  def q43AnnIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(
      corpus(spark, dir), queryVectors(spark, dir), k = 10)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cosine_topk" -> (q40CosineTopK _),
    "q41_ann_topk"    -> (q41AnnTopK _),
    "q42_ann_neardup" -> (q42AnnNeardup _),
    "q43_ann_ivf"     -> (q43AnnIvf _)
  )

  val oracles: Map[String, String] = Map(
    "q40_cosine_topk" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (
        |      PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |               c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 10) t
        |WHERE rank <= 10""".stripMargin
  )
}
