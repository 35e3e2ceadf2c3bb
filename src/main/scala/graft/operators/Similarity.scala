package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`), for similarity search and embedding-cosine dedup
  * in a training-data pipeline.
  *
  * Two paths, same output contract (query_id, neighbor_id, rank):
  *   - [[bruteForceTopK]] — exact cosine against every corpus vector.
  *     The correctness baseline; O(|corpus|·|queries|) but fully
  *     distributed: queries broadcast, corpus streamed, per-query
  *     top-k via window.
  *   - [[annTopK]] — signed-random-projection LSH: vectors meet only
  *     inside equal (table, bucket) cells, so the corpus scan is
  *     replaced by bucket joins. The 100 TB path.
  *
  * Cosine is a sequential left-to-right fold over the array (built-in
  * `aggregate`), so scores are bit-deterministic across partitionings.
  * No UDFs anywhere — everything codegen-able higher-order expressions.
  */
object Similarity {

  /** Exact cosine similarity between two array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact top-k neighbors for each query vector.
    *
    * Scale notes: `queries` is broadcast (a query batch is small by
    * construction); the corpus never shuffles for scoring — only the
    * (|queries|·k-bounded) per-query window does. For huge query
    * batches, partition the batch and union. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic Gaussian hyperplanes: `tables` hash tables ×
    * `bits` hyperplanes each, fixed seed → identical across runs. */
  private def hyperplanes(dim: Int, tables: Int, bits: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Bucket id per table: sign bits of the projections packed to a long. */
  private def bucketExpr(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      val proj = aggregate(
        zip_with(vec, typedLit(p.toSeq), (x, r) => x * r), lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SRP-LSH approximate top-k: same contract as [[bruteForceTopK]],
    * but neighbors are drawn from LSH bucket collisions only, then
    * exactly scored and ranked. Recall grows with `tables`; on
    * adversarially-uniform random corpora (no cluster structure) even
    * many tables recall imperfectly — that is a property of LSH, not
    * of this implementation, and the spec pins it against the
    * brute-force baseline. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 8, bits: Int = 8, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val hp = hyperplanes(dim, tables, bits, seed)

    // Bucket with IDS ONLY: carrying the vectors through the
    // tables-way explode and the bucket join multiplies shuffle bytes
    // by `tables`; vectors are re-attached just for final scoring.
    def bucketed(df: DataFrame, id: String): DataFrame = {
      val v = asDouble(col(vecCol))
      val buckets = array((0 until tables).map(t => bucketExpr(v, hp(t))): _*)
      df.select(col(idCol).as(id),
        posexplode(buckets).as(Seq("table_id", "bucket")))
    }

    val cq = bucketed(queries, "query_id")
    val cc = bucketed(corpus, "neighbor_id")
    val candidates = cc.join(cq.hint("broadcast"), Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val qv = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    candidates
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold — the
    * embedding leg of the dedup suite. LSH self-join candidates,
    * exact-cosine verification; O(collisions), never O(n²). */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
                         tables: Int = 8, bits: Int = 8, seed: Long = 42L,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val hp = hyperplanes(dim, tables, bits, seed)
    val v = asDouble(col(vecCol))
    val buckets = array((0 until tables).map(t => bucketExpr(v, hp(t))): _*)
    // ids-only through the explode + self-join (see annTopK)
    val b = corpus.select(col(idCol).as("id"),
      posexplode(buckets).as(Seq("table_id", "bucket")))
    val pairs = b.as("a").join(b.as("b"),
        col("a.table_id") === col("b.table_id") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .dropDuplicates("d1", "d2")
    val v1 = corpus.select(col(idCol).as("d1"), v.as("v1"))
    val v2 = corpus.select(col(idCol).as("d2"), v.as("v2"))
    pairs.join(v1, "d1").join(v2, "d2")
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select("d1", "d2", "cos")
  }
}
