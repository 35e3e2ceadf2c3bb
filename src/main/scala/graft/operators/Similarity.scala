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
  * All per-row math goes through two native codegen'd expressions —
  * [[graft.functions.CosineSim]] (scoring) and
  * [[graft.functions.SrpBuckets]] (LSH bucketing). Both accumulate
  * strictly left-to-right, so scores are bit-deterministic across
  * partitionings; buckets are derived from (dim, tables, bits, seed)
  * on each executor with no driver round-trip. No UDFs anywhere.
  */
object Similarity {

  /** [[semanticDedup]]'s dimension ceiling: dot ≤ d·128², and the gate
    * compares dot²·10⁴ in BIGINT — d ≤ 1800 keeps the product under
    * 2⁶³ with margin (d=1854 is the exact overflow edge). */
  val MaxSemanticDedupDim = 1800

  /** Exact cosine similarity between two array<double> columns —
    * the higher-order-function reference formulation. Query paths use
    * the native `cosine_sim` (bit-identical, JIT'd); this stays as
    * the public Column-level API and the cross-check in specs. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def registerFns(df: DataFrame): Unit = {
    graft.functions.CosineSim.register(df.sparkSession)
    graft.functions.SrpBuckets.register(df.sparkSession)
  }

  /** Exact top-k neighbors for each query vector.
    *
    * Scale notes: `queries` is broadcast (a query batch is small by
    * construction); the corpus never shuffles for scoring — only the
    * (|queries|·k-bounded) per-query window does. For huge query
    * batches, partition the batch and union. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerFns(corpus)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", expr("cosine_sim(qv, cv)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Per-table LSH bucket ids for a vector column: native SRP
    * projection (packed sign bits of seeded Gaussian hyperplanes).
    * call_function, not an expr() splice — `vecCol` is a
    * caller-supplied column name. */
  private def bucketsOf(vecCol: String, tables: Int, bits: Int, seed: Long): Column =
    call_function("srp_buckets", col(vecCol), lit(tables), lit(bits), lit(seed))

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
    registerFns(corpus)
    // Bucket with IDS ONLY: carrying the vectors through the
    // tables-way explode and the bucket join multiplies shuffle bytes
    // by `tables`; vectors are re-attached just for final scoring.
    def bucketed(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
        posexplode(bucketsOf(vecCol, tables, bits, seed)).as(Seq("table_id", "bucket")))

    val cq = bucketed(queries, "query_id")
    val cc = bucketed(corpus, "neighbor_id")
    val candidates = cc.join(cq.hint("broadcast"), Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    scoreTopK(candidates, corpus, queries, k, idCol, vecCol)
  }

  /** Exact-score a candidate (query_id, neighbor_id) frame and keep
    * the per-query top-k — the shared verification tail of every ANN
    * path (candidates differ, scoring doesn't). */
  private def scoreTopK(candidates: DataFrame, corpus: DataFrame, queries: DataFrame,
                        k: Int, idCol: String, vecCol: String): DataFrame = {
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    candidates
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("cos", expr("cosine_sim(qv, cv)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Per-vector nearest-centroid assignment (cosine argmax): the
    * shared kernel of IVF list-building and Lloyd refinement.
    * Centroids broadcast; the groupBy's max_by partial-aggregates
    * map-side, so the shuffle carries one row per vector. The `-cid`
    * tie-break keeps the argmax deterministic under score ties. */
  private def assignToCentroids(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs
      .crossJoin(broadcast(cents))
      .withColumn("cos", expr("cosine_sim(cv, cvec)"))
      .groupBy("vid")
      .agg(
        max_by(col("cid"), struct(col("cos"), -col("cid"))).as("list_id"),
        first(col("cv")).as("cv")) // constant within the group

  /** One or more Lloyd iterations over seeded centroids: assign the
    * training vectors to their nearest centroid, replace each centroid
    * with the per-dimension MEAN of its members — the k-means step
    * that moves list centers toward the data's density, which is what
    * lifts recall at a fixed probed share (measured via RecallProbe on
    * the pinned dials nlist=64/nprobe=8, lloyd=2: 0.46 -> 0.57
    * recall@10 at a 1/8 probed share — the sweep row q58 is pinned to).
    *
    * Determinism at any partitioning: the mean accumulates in exact
    * DECIMAL (FP addition is not associative across partitions, and a
    * partitioning-dependent centroid would flip downstream top-k rows
    * between runs); members collect back into a vector via an
    * array_sort on (pos, m) structs. A centroid that captures no
    * training vectors drops out (its list would be empty anyway). */
  private def refineCentroids(train: DataFrame, cents0: DataFrame,
                              iters: Int): DataFrame = {
    var cents = cents0
    for (_ <- 1 to iters) {
      cents = assignToCentroids(train, cents)
        .select(col("list_id"), posexplode(col("cv")).as(Seq("pos", "v")))
        .groupBy("list_id", "pos")
        .agg((sum(col("v").cast("decimal(27,15)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("list_id").as("cid"),
          expr("transform(pm, s -> s.m)").as("cvec"))
    }
    cents
  }

  /** IVF-flat approximate top-k: the corpus is coarse-quantized into
    * `nlist` inverted lists (centroids = a deterministic seeded-hash
    * sample of the corpus, refined by `lloydIters` distributed k-means
    * steps over a bounded training sample), each vector joins its
    * nearest centroid's list, and each query exactly scores only the
    * members of its `nprobe` nearest lists.
    *
    * vs [[annTopK]] (SRP-LSH): IVF adapts to the data distribution —
    * lists land where vectors are dense — while SRP is data-oblivious;
    * candidate volume is ~nprobe/nlist of the corpus by construction,
    * a directly tunable recall/cost dial. Both are bucket joins, never
    * O(n²).
    *
    * Scale shape: centroids are a broadcast dimension (nlist·dim
    * doubles); Lloyd training runs on a hash-sample capped at
    * 256·nlist vectors (the standard IVF practice — training cost is
    * bounded regardless of corpus size, and 256 members per list is
    * plenty for stable means); corpus assignment is one broadcast
    * nested-loop pass + a map-side-combinable argmax (shuffle carries
    * one row per vector); the list join shuffles ids only. Hot lists
    * (dense regions) are AQE skew-join territory, same as any skewed
    * key. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 32, nprobe: Int = 4, lloydIters: Int = 2,
              seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKIndexed(
      ivfBuildIndex(corpus, nlist, lloydIters, seed, idCol, vecCol),
      queries, k, nprobe, idCol, vecCol)

  /** Materialized IVF index: the centroid table (cid, cvec) and the
    * posting lists (vid, cv, list_id — vectors clustered by their
    * nearest centroid). An ingest pipeline persists both and appends
    * new vectors via [[ivfAssign]] against the FROZEN centroids; query
    * time is [[ivfTopKIndexed]] — no retraining, no corpus re-scan.
    * (Centroid drift under a shifting distribution is the operator's
    * documented retrain trigger, not something queries pay for.) */
  case class IvfIndex(centroids: DataFrame, lists: DataFrame)

  /** Train centroids (seeded sample + bounded Lloyd refinement) and
    * cluster the corpus into posting lists — [[ivfTopK]]'s build leg,
    * exposed for index materialization. */
  def ivfBuildIndex(corpus: DataFrame,
                    nlist: Int = 32, lloydIters: Int = 2, seed: Long = 42L,
                    idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    registerFns(corpus)
    // deterministic density-following sample: the nlist corpus rows
    // with the smallest seeded id-hashes; the centroid's own vec_id is
    // the list id (no global row_number needed)
    val seeds = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .withColumn("h", xxhash64(col("cid"), lit(seed)))
      .orderBy("h").limit(nlist)
      .select("cid", "cvec")
    val centsPlan =
      if (lloydIters <= 0) seeds
      else {
        // bounded deterministic training sample: smallest seeded
        // id-hashes again (a different seed stream than the centroid
        // draw so the sample isn't biased toward the seeds)
        val train = corpus
          .select(col(idCol).as("vid"), col(vecCol).as("cv"))
          .withColumn("h", xxhash64(col("vid"), lit(seed + 1)))
          .orderBy("h").limit(256 * nlist)
          .select("vid", "cv")
        refineCentroids(train, seeds, lloydIters)
      }
    // Materialize the centroid table ONCE (nlist rows — trivial to
    // cache, expensive to rebuild): it feeds two broadcasts (corpus
    // assignment + query probing) and AQE's exchange reuse does not
    // reliably dedupe them, so an unpersisted plan re-runs the whole
    // multi-stage Lloyd chain per consumer (measured ~2× q43 wall
    // time). Routed through Memo so benchmark passes and session end
    // reclaim it; the key carries every input that shapes the result.
    val cents = graft.ops.Memo.of(corpus.sparkSession,
      s"ivf_cents:$nlist:$lloydIters:$seed:$idCol:$vecCol:${graft.ops.Memo.frameKey(corpus)}") {
      centsPlan
    }
    IvfIndex(cents, ivfAssign(cents,
      corpus.select(col(idCol).as("vid"), col(vecCol).as("cv"))))
  }

  /** Cluster vectors (vid, cv) into posting-list rows against frozen
    * centroids — the per-batch append of a vector ingest. */
  def ivfAssign(centroids: DataFrame, vectors: DataFrame): DataFrame =
    assignToCentroids(vectors, centroids).select("vid", "cv", "list_id")

  /** IVF query against a materialized index: probe the `nprobe`
    * nearest lists per query, exactly score only their members. Same
    * output contract (and bit-identical results) as [[ivfTopK]] at
    * equal dials — the spec pins the equivalence. */
  def ivfTopKIndexed(index: IvfIndex, queries: DataFrame, k: Int,
                     nprobe: Int = 4,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerFns(queries)
    // query → nprobe nearest lists (query batch is small; the window
    // partitions by query)
    val wq = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cid").asc)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("cos", expr("cosine_sim(qv, cvec)"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("cid").as("list_id"))
    // every vector sits in exactly one list and probes are distinct
    // lists, so (query, neighbor) candidates are already unique; the
    // lists carry their vectors (the IVF layout), so scoring needs no
    // corpus join
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    index.lists
      .select(col("vid").as("neighbor_id"), col("cv"), col("list_id"))
      .join(probes.hint("broadcast"), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(qv), "query_id")
      .withColumn("cos", expr("cosine_sim(qv, cv)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Per-vector affine int8 quantization: x ≈ qmin + (q+128)·qscale
    * with q ∈ tinyint — 4× smaller than float32, 8× smaller than
    * float64, which at 100 TB of embeddings is the difference between
    * a corpus that fits executor memory for list-scoring and one that
    * doesn't. Per-vector (not per-corpus) ranges keep outlier vectors
    * from crushing everyone else's resolution; a constant vector
    * degrades to scale 1 instead of dividing by zero (ANSI-safe).
    *
    * Columns added: `q array<tinyint>`, `qmin double`,
    * `qscale double`. All arithmetic is per-row HOF work — no shuffle,
    * fully parallel. [[dequantize]] reconstructs; the spec pins
    * reconstruction cosine ≥ 0.999 and top-k agreement on the
    * fixture. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df
      .withColumn("qmin", array_min(col(vecCol)).cast("double"))
      .withColumn("qscale",
        greatest((array_max(col(vecCol)).cast("double") - col("qmin")) / lit(255.0),
          lit(1e-30)))
      .withColumn("q", expr(
        s"transform($vecCol, x -> cast(round((cast(x as double) - qmin) / qscale) - 128 as tinyint))"))

  /** Reconstruct a double vector from [[quantizeInt8]]'s columns. */
  def dequantize(df: DataFrame, outCol: String = "dq"): DataFrame =
    df.withColumn(outCol,
      expr("transform(q, v -> qmin + (cast(v as double) + 128.0d) * qscale)"))

  // ------------------------------------------------ product quantization

  /** L2-normalize a vector column into `outCol` (double). Constant/
    * zero vectors keep direction 0 instead of dividing by zero. On a
    * normalized corpus, L2² = 2 − 2·cos, so PQ's Euclidean machinery
    * ranks exactly like cosine — which is what lets [[pqTopK]] share
    * q40's cosine ground truth. */
  def l2Normalize(df: DataFrame, vecCol: String = "embedding",
                  outCol: String = "nv"): DataFrame =
    df
      .withColumn("_nrm", expr(
        s"sqrt(aggregate(zip_with($vecCol, $vecCol, " +
          "(x, y) -> cast(x as double) * y), 0d, (a, v) -> a + v))"))
      .withColumn(outCol, expr(
        s"transform($vecCol, x -> cast(x as double) / greatest(_nrm, 1e-30d))"))
      .drop("_nrm")

  /** Squared L2 between two double arrays, accumulated strictly
    * left-to-right (bit-deterministic across partitionings). */
  private def l2sqSql(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "0d, (acc, v) -> acc + v)"

  /** Explode a normalized vector into its m subvectors: rows
    * (…, sub, sv) with sv = dims [sub·d/m, (sub+1)·d/m). The split is
    * in-plan (`size(nv) div m`), so one codebook API serves any
    * dimension; dims must divide evenly by m — ENFORCED in-plan with
    * `raise_error` (a silent `div` would drop the trailing `size mod
    * m` dimensions and rank on a prefix of every vector with no
    * sign anything was lost). */
  private def subvectors(df: DataFrame, m: Int): DataFrame =
    df
      .withColumn("_nvck", when(expr(s"pmod(size(nv), $m) != 0"),
        expr(s"cast(raise_error(concat('PQ: vector dim ', size(nv), " +
          s"' not divisible by m=$m')) as array<double>)"))
        .otherwise(col("nv")))
      .select(col("*"), explode(expr(
        s"transform(sequence(0, ${m - 1}), _s -> struct(_s as sub, " +
          s"slice(_nvck, _s * (size(_nvck) div $m) + 1, size(_nvck) div $m) as sv))"))
        .as("p"))
      .withColumn("sub", col("p.sub")).withColumn("sv", col("p.sv"))
      .drop("p", "nv", "_nvck")

  /** Per-subspace codebooks: (sub, cid, cvec) — `m` independent
    * ksub-way k-means problems over the corpus' subvectors. */
  case class PqCodebook(centroids: DataFrame, m: Int, ksub: Int)

  /** Nearest-centroid assignment per (vector, subspace): argmin L2²
    * with a cid-asc tiebreak — deterministic on every partitioning. */
  private def pqAssign(subvecs: DataFrame, cents: DataFrame): DataFrame =
    subvecs.join(broadcast(cents), Seq("sub"))
      .withColumn("d2", expr(l2sqSql("sv", "cvec")))
      .groupBy("vid", "sub")
      .agg(max_by(col("cid"), struct((-col("d2")).as("nd"),
        (-col("cid")).as("nc"))).as("cid"),
        first(col("sv")).as("sv")) // constant within the group

  /** Train product-quantization codebooks — Jégou et al., "Product
    * Quantization for Nearest Neighbor Search" (TPAMI 2011): split
    * each (L2-normalized) vector into `m` subvectors, k-means each
    * subspace to `ksub` centroids, so a d-dim float vector compresses
    * to m small codes (m bytes at ksub ≤ 256 — 32× beyond
    * [[quantizeInt8]]'s 4×) while distances remain computable against
    * the codes alone. The k-means machinery mirrors [[ivfBuildIndex]]
    * exactly: deterministic smallest-seeded-hash seeds (one draw
    * shared by all subspaces — each gets its slice), a bounded
    * 256·ksub training sample so training cost is corpus-size-free,
    * Lloyd means in exact DECIMAL (partitioning-deterministic), empty
    * centroids drop. Memoized per (dials, corpus plan) like the IVF
    * centroid table and for the same reason: it feeds multiple
    * broadcasts. */
  def pqTrain(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
              lloydIters: Int = 2, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): PqCodebook =
    pqTrainOn(
      l2Normalize(corpus, vecCol).select(col(idCol).as("vid"), col("nv")),
      m, ksub, lloydIters, seed,
      s"pq_cents:$m:$ksub:$lloydIters:$seed:$idCol:$vecCol:${graft.ops.Memo.frameKey(corpus)}")

  /** [[pqTrain]]'s core over a PRE-BUILT (vid, nv) frame with NO
    * normalization — the residual-space entry point: IVF-PQ quantizes
    * `nv − coarse_centroid` vectors, which must not be re-normalized
    * (their magnitude IS the information the codebook captures). */
  private[operators] def pqTrainOn(nv: DataFrame, m: Int, ksub: Int,
                                   lloydIters: Int, seed: Long,
                                   memoKey: String): PqCodebook = {
    require(m >= 1 && ksub >= 2, s"bad PQ dials: m=$m ksub=$ksub")
    val w = Window.orderBy(col("h").asc, col("vid").asc)
    val seeds = subvectors(
      nv.withColumn("h", xxhash64(col("vid"), lit(seed)))
        .orderBy("h", "vid").limit(ksub)
        .withColumn("cid", row_number().over(w) - 1), m)
      .select(col("sub"), col("cid"), col("sv").as("cvec"))
    val cents0 =
      if (lloydIters <= 0) seeds
      else {
        val train = subvectors(
          nv.withColumn("h", xxhash64(col("vid"), lit(seed + 1)))
            .orderBy("h", "vid").limit(256 * ksub).drop("h"), m)
        var cents = seeds
        for (_ <- 1 to lloydIters) {
          cents = pqAssign(train, cents)
            .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
            .groupBy("sub", "cid", "pos")
            .agg((sum(col("v").cast("decimal(27,15)")) / count(lit(1)))
              .cast("double").as("mu"))
            .groupBy("sub", "cid")
            .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
            .select(col("sub"), col("cid"),
              expr("transform(pm, s -> s.mu)").as("cvec"))
        }
        cents
      }
    val cents = graft.ops.Memo.of(nv.sparkSession, memoKey)(cents0)
    PqCodebook(cents, m, ksub)
  }

  /** Encode a corpus against frozen codebooks: (vec_id, sub, code) —
    * the materialized PQ index rows a vector ingest appends to, m
    * small integers per vector. One broadcast pass, shuffle carries
    * ids+codes only. */
  def pqEncode(corpus: DataFrame, cb: PqCodebook,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqEncodeOn(l2Normalize(corpus, vecCol)
      .select(col(idCol).as("vid"), col("nv")), cb)
      .select(col("vid").as(idCol), col("sub"), col("code"))

  /** [[pqEncode]]'s core over a pre-built (vid, nv) frame (no
    * normalization — the residual-space entry point). */
  private[operators] def pqEncodeOn(nv: DataFrame, cb: PqCodebook): DataFrame =
    pqAssign(subvectors(nv, cb.m), cb.centroids)
      .select(col("vid"), col("sub"), col("cid").as("code"))

  /** Residual encode with the list id CARRIED through the argmax's
    * group keys (constant per vid) — the IVF-PQ build/append path
    * needs (vid, list_id, sub, code) and would otherwise pay a
    * join-back to the assignment frame for a column it already had. */
  private def pqEncodeListed(resid: DataFrame, cb: PqCodebook): DataFrame =
    subvectors(resid, cb.m)
      .join(broadcast(cb.centroids), Seq("sub"))
      .withColumn("d2", expr(l2sqSql("sv", "cvec")))
      .groupBy("vid", "list_id", "sub")
      .agg(max_by(col("cid"), struct((-col("d2")).as("nd"),
        (-col("cid")).as("nc"))).as("code"))
      .select("vid", "list_id", "sub", "code")

  /** Asymmetric-distance top-k over a PQ-encoded corpus (ADC, Jégou
    * et al. §IV): each query computes one m×ksub distance table
    * against the codebooks (exact query vs quantized corpus — the
    * asymmetric side is free precision), every corpus vector's
    * approximate distance is m table LOOKUPS summed — never a d-dim
    * float op — and the ADC top-`rerank` shortlist is re-scored
    * exactly (the standard two-stage: ADC recalls, floats decide).
    * Same output contract as [[bruteForceTopK]]; scale shape: the
    * table is |Q|·m·ksub broadcast rows, the corpus side touches only
    * (id, sub, code) — the point of PQ at 100 TB: the float corpus
    * stays on disk until the shortlist. */
  def pqTopK(codes: DataFrame, cb: PqCodebook,
             corpus: DataFrame, queries: DataFrame, k: Int,
             rerank: Int = 50,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    registerFns(queries) // scoreTopK's exact rerank uses cosine_sim
    val table = subvectors(
      l2Normalize(queries, vecCol)
        .select(col(idCol).as("query_id"), col("nv")), cb.m)
      .join(broadcast(cb.centroids), Seq("sub"))
      .withColumn("d2", expr(l2sqSql("sv", "cvec")))
      .select(col("query_id"), col("sub"), col("cid").as("code"), col("d2"))
    val wa = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val shortlist = codes
      .select(col(idCol).as("neighbor_id"), col("sub"), col("code"))
      .join(broadcast(table), Seq("sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      // exact DECIMAL accumulation: FP addition over the m partial
      // distances is partitioning-order-dependent, and a flipped ulp
      // on an adist tie would swap shortlist membership between runs
      .agg(sum(col("d2").cast("decimal(27,15)")).as("adist"))
      .withColumn("ar", row_number().over(wa))
      .filter(col("ar") <= rerank)
      .select("query_id", "neighbor_id")
    scoreTopK(shortlist, corpus, queries, k, idCol, vecCol)
  }

  // --------------------------------------------------------- IVF-PQ (IVFADC)

  /** Materialized IVF-PQ index — Jégou et al. §V's IVFADC, the actual
    * 100 TB embedding-store layout: coarse centroids route queries to
    * lists, and each list member is stored as m PQ codes of its
    * RESIDUAL (vector − its list's centroid). `centroids` (cid, cvec)
    * live in the L2-normalized corpus space; `codebook` quantizes
    * residual space; `codes` rows are (vid, list_id, sub, code) — the
    * whole corpus persists as m+1 small integers per vector. */
  case class IvfPqIndex(centroids: DataFrame, codebook: PqCodebook,
                        codes: DataFrame)

  /** Build an IVF-PQ index: coarse-quantize the normalized corpus into
    * `nlist` lists (the [[ivfBuildIndex]] machinery verbatim), then
    * PQ-train on the RESIDUALS and encode every vector's residual
    * against the shared codebook. Residuals are the reason IVFADC
    * out-recalls flat PQ at equal code budget: after subtracting the
    * list centroid the vectors the codebook must cover occupy a much
    * smaller ball, so the same ksub centroids quantize finer (Jégou
    * §V.A). Residuals are NOT re-normalized — their magnitude is the
    * signal ([[pqTrainOn]]).
    *
    * Scale shape: everything bounded or per-row — coarse training on
    * the 256·nlist sample, PQ training on a 256·ksub residual sample,
    * corpus assignment one broadcast pass, the final code join
    * shuffles (id, list, sub, code) ints only. */
  def ivfPqBuild(corpus: DataFrame, nlist: Int = 64, m: Int = 8,
                 ksub: Int = 16, lloydIters: Int = 2, seed: Long = 42L,
                 idCol: String = "vec_id", vecCol: String = "embedding"): IvfPqIndex = {
    registerFns(corpus)
    val nvCorpus = l2Normalize(corpus, vecCol)
      .select(col(idCol).as("vec_id"), col("nv").as("embedding"))
    val ivf = ivfBuildIndex(nvCorpus, nlist, lloydIters, seed)
    // residual per assigned vector: nv − its list's centroid
    val resid = ivf.lists
      .join(broadcast(ivf.centroids), col("list_id") === col("cid"))
      .select(col("vid"), col("list_id"),
        expr("zip_with(cv, cvec, (x, c) -> x - c)").as("nv"))
    val cb = pqTrainOn(resid.select("vid", "nv"), m, ksub, lloydIters, seed,
      s"ivfpq_cents:$nlist:$m:$ksub:$lloydIters:$seed:$idCol:$vecCol:" +
        graft.ops.Memo.frameKey(corpus))
    IvfPqIndex(ivf.centroids, cb, pqEncodeListed(resid, cb))
  }

  /** Cluster + encode vectors against a FROZEN IVF-PQ index (coarse
    * centroids + residual codebook): (vid, list_id, sub, code) rows —
    * the per-batch append of a vector ingest, mirroring [[ivfAssign]]
    * for the composed index. One broadcast assignment pass + one
    * broadcast encode pass; the shuffle carries ids + ints only. */
  def ivfPqAssign(centroids: DataFrame, cb: PqCodebook, vectors: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerFns(vectors)
    val nv = l2Normalize(vectors, vecCol)
      .select(col(idCol).as("vid"), col("nv").as("cv"))
    val resid = assignToCentroids(nv, centroids)
      .join(broadcast(centroids), col("list_id") === col("cid"))
      .select(col("vid"), col("list_id"),
        expr("zip_with(cv, cvec, (x, c) -> x - c)").as("nv"))
    pqEncodeListed(resid, cb)
  }

  /** IVF-PQ top-k (IVFADC search, Jégou §V.B): each query probes its
    * `nprobe` nearest lists, computes ONE m×ksub residual distance
    * table PER PROBED LIST (the query residual differs per list —
    * that is the asymmetric+residual trick), ADC-scores only the
    * probed lists' code rows by m lookups each, and float-reranks the
    * decimal-deterministic shortlist. vs flat [[pqTopK]]: the scored
    * candidate set drops from the whole corpus to ~nprobe/nlist of it,
    * while residual codebooks quantize finer — recall goes UP as cost
    * goes down (q175 pins both sides of that trade on the fixture).
    * The broadcast side is |Q|·nprobe·m·ksub table rows; the corpus
    * side moves only the probed lists' int codes. */
  def ivfPqTopK(index: IvfPqIndex, queries: DataFrame, corpus: DataFrame,
                k: Int, nprobe: Int = 16, rerank: Int = 50,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    registerFns(queries)
    val qn = l2Normalize(queries, vecCol)
      .select(col(idCol).as("query_id"), col("nv").as("qv"))
    val wq = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cid").asc)
    // probe routing + per-list query residual in one pass
    val probes = qn
      .crossJoin(broadcast(index.centroids))
      .withColumn("cos", expr("cosine_sim(qv, cvec)"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("cid").as("list_id"),
        expr("zip_with(qv, cvec, (x, c) -> x - c)").as("nv"))
    val table = subvectors(probes, index.codebook.m)
      .join(broadcast(index.codebook.centroids), Seq("sub"))
      .withColumn("d2", expr(l2sqSql("sv", "cvec")))
      .select(col("query_id"), col("list_id"), col("sub"),
        col("cid").as("code"), col("d2"))
    val wa = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val shortlist = index.codes
      .select(col("vid").as("neighbor_id"), col("list_id"), col("sub"), col("code"))
      .join(broadcast(table), Seq("list_id", "sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      // exact decimal accumulation — the pqTopK determinism stance
      .agg(sum(col("d2").cast("decimal(27,15)")).as("adist"))
      .withColumn("ar", row_number().over(wa))
      .filter(col("ar") <= rerank)
      .select("query_id", "neighbor_id")
    scoreTopK(shortlist, corpus, queries, k, idCol, vecCol)
  }

  /** Exact all-pairs cosine above a threshold — the brute-force
    * ORACLE leg for [[cosineNearDupPairs]] (same contract), O(n²) by
    * construction: every pair is scored. Correctness baseline and
    * recall denominator only — never the scale path; at real corpus
    * sizes use the LSH variant. */
  def bruteForcePairs(corpus: DataFrame, threshold: Double,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerFns(corpus)
    val a = corpus.select(col(idCol).as("d1"), col(vecCol).as("v1"))
    val b = corpus.select(col(idCol).as("d2"), col(vecCol).as("v2"))
    a.join(b, col("d1") < col("d2"))
      .withColumn("cos", expr("cosine_sim(v1, v2)"))
      .filter(col("cos") >= threshold)
      .select("d1", "d2", "cos")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold — the
    * embedding leg of the dedup suite. LSH self-join candidates,
    * exact-cosine verification; O(collisions), never O(n²). */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
                         tables: Int = 8, bits: Int = 8, seed: Long = 42L,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerFns(corpus)
    // ids-only through the explode + self-join (see annTopK)
    val b = corpus.select(col(idCol).as("id"),
      posexplode(bucketsOf(vecCol, tables, bits, seed)).as(Seq("table_id", "bucket")))
    val pairs = b.as("a").join(b.as("b"),
        col("a.table_id") === col("b.table_id") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .dropDuplicates("d1", "d2")
    val v1 = corpus.select(col(idCol).as("d1"), col(vecCol).as("v1"))
    val v2 = corpus.select(col(idCol).as("d2"), col(vecCol).as("v2"))
    pairs.join(v1, "d1").join(v2, "d2")
      .withColumn("cos", expr("cosine_sim(v1, v2)"))
      .filter(col("cos") >= threshold)
      .select("d1", "d2", "cos")
  }

  /** SemDeDup-style semantic dedup over the STORED int8 codes — no
    * float vector ever leaves the scan. Every decision is integer
    * arithmetic, so the whole kept/pruned verdict is engine- and
    * partitioning-deterministic (and the DuckDB oracle replays it
    * bit-for-bit — unlike float-cosine gates, where the last ulp is
    * engine-dependent and only agreement rows survive a hash check).
    *
    * Pipeline:
    *   1. quantize ([[quantizeInt8]]'s exact formula) → codes
    *      c ∈ [−128,127] and an integer self-product ss = Σc².
    *   2. candidate generation: `bands` sign-bit buckets — band b
    *      keys on the sign pattern of dims [b·bandBits, (b+1)·bandBits);
    *      vectors meet only inside an equal (band, bucket) cell. Sign
    *      tests on float32 are exact, so bucketing is deterministic
    *      (this is SRP-LSH with axis-aligned hyperplanes).
    *   3. gate: quantized cosine ≥ t, decided as
    *      dot>0 ∧ dot²·10⁴ ≥ simNumSqE4·ss₁·ss₂  (simNumSqE4 = t²·10⁴)
    *      — all in BIGINT (safe for dims ≤ ~1800: dot ≤ d·128²,
    *      dot²·10⁴ must stay under 2⁶³).
    *   4. keep rule: a vector is pruned iff ANY lower-id candidate
    *      passes the gate (keep-first; one join, no sequential greedy
    *      chain — the standard parallel relaxation).
    *
    * Scale shape: ids-only through the band explode and bucket
    * self-join (the LSH pattern of [[cosineNearDupPairs]]); codes join
    * back only for candidate pairs. `bandBits` must grow with corpus
    * size to keep bucket occupancy bounded (occupancy ≈ n/2^bandBits
    * per band); hot buckets (near-zero dims) salt like any skewed key.
    * At 100 TB the int8 codes are ¼ the bytes of float32 through every
    * shuffle — the reason dedup runs on codes, not vectors.
    *
    * Output: one row per input vector —
    * (idCol, kept BIGINT 1/0, dup_of BIGINT nullable = min pruning id).
    */
  def semanticDedup(corpus: DataFrame, bands: Int = 8, bandBits: Int = 6,
                    simNumSqE4: Long = 2025L,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    pairsOnly: Boolean = false): DataFrame = {
    // dim bounds: vectors must have >= bands*bandBits dims (the sign
    // buckets read those positions; ANSI element_at throws past the
    // end — loud, not silent) and <= ~1800 dims (the BIGINT gate's
    // overflow ceiling, see step 3 below)
    require(bands >= 1 && bandBits >= 1 && bandBits <= 16,
      s"need bands >= 1 and bandBits in [1,16], got $bands/$bandBits")
    require(simNumSqE4 >= 0L && simNumSqE4 <= 10000L,
      s"simNumSqE4 is t^2 * 1e4, must be in [0,10000]: $simNumSqE4")
    graft.functions.IntDot.register(corpus.sparkSession)
    // enforce BOTH dim bounds up front (one head() row — the embedding
    // tables' uniform-dimension contract makes the first row
    // representative): past ~1800 dims the BIGINT gate would wrap
    // (non-ANSI) or fail the job mid-stage instead of erroring here,
    // and below bands*bandBits the sign buckets would read past the
    // array end
    corpus.select(col(vecCol)).head(1).headOption.foreach { r =>
      val d = r.getSeq[Any](0).size
      require(d <= MaxSemanticDedupDim,
        s"semanticDedup's integer gate (dot^2 * 1e4 in BIGINT) is safe " +
          s"only for dims <= $MaxSemanticDedupDim; got $d — reduce the " +
          "embedding dimension (e.g. a projection) or use " +
          "cosineNearDupPairs (float gate) instead")
      require(d >= bands * bandBits,
        s"vectors have $d dims but the sign bands read " +
          s"bands*bandBits = ${bands * bandBits} positions")
    }
    // codes come FROM [[quantizeInt8]] (not a re-derivation) so the
    // "q74's proven formula" claim is compile-time true — only the
    // tinyint→bigint widening happens here
    val coded = quantizeInt8(corpus, vecCol)
      .withColumn("c", expr("transform(q, v -> cast(v as bigint))"))
      .withColumn("ss", expr("int_dot(c, c)"))
    // sign-pattern bucket of band b over the ORIGINAL floats (sign of
    // a float compares exactly; the quantized code's sign would shift
    // with qmin)
    def bandBucket(b: Int): Column =
      (0 until bandBits).map { i =>
        when(element_at(col(vecCol), b * bandBits + i + 1) >= lit(0f),
          lit(1L << (bandBits - 1 - i))).otherwise(lit(0L))
      }.reduce(_ + _)
    val sigs = coded.select(col(idCol).as("vid"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).cast("long").as("band"), bandBucket(b).as("bkt"))): _*)).as("e"))
      .select(col("vid"), col("e.band").as("band"), col("e.bkt").as("bkt"))
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.bkt") === col("b.bkt") &&
        col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("d1"), col("b.vid").as("d2"))
      .dropDuplicates("d1", "d2")
    val side1 = coded.select(col(idCol).as("d1"), col("c").as("c1"), col("ss").as("ss1"))
    val side2 = coded.select(col(idCol).as("d2"), col("c").as("c2"), col("ss").as("ss2"))
    val pruned = cand.join(side1, "d1").join(side2, "d2")
      .withColumn("dot", expr("int_dot(c1, c2)"))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(10000L) >= lit(simNumSqE4) * col("ss1") * col("ss2"))
    if (pairsOnly)
      pruned.select(col("d1"), col("d2"), col("dot"), col("ss1"), col("ss2"))
    else {
      val dupOf = pruned
        .groupBy(col("d2").as(idCol))
        .agg(min(col("d1")).as("dup_of"))
      corpus.select(col(idCol))
        .join(dupOf, Seq(idCol), "left")
        .select(col(idCol),
          col("dup_of").isNull.cast("long").as("kept"),
          col("dup_of"))
    }
  }

  /** Production sizing for [[semanticNearDupPairsSrp]]'s `bits` dial
    * (r17 — the r16 ladder documented the recipe in prose; this is
    * the [[graft.sources.WebArchive.fanoutFor]] convention of making
    * the recipe an artifact): `bits = ceil(log2(n · tables /
    * targetOccupancy))` holds expected bucket occupancy — and with it
    * the per-bucket candidate share — constant as the corpus grows,
    * which is exactly the ladder's measured 12 → 14 → 16 progression
    * (+2 bits per 4× data at n = 2000/8000/32000, tables = 8,
    * occupancy 4; ARCHITECTURE r16 ladder table). Cost grows as
    * tables × bits hyperplane projections per vector — linear in
    * bits, so the dial is cheap to grow where the sign-band family's
    * key space was CAPPED at 2^(d/bands). Clamped to [minBits, 62]
    * (the bucket key is one BIGINT bit pattern). */
  def srpBitsFor(n: Long, tables: Int = 8, targetOccupancy: Long = 4L,
                 minBits: Int = 8): Int = {
    require(n >= 0 && tables > 0 && targetOccupancy > 0 &&
      minBits >= 1 && minBits <= 62,
      s"need n >= 0, tables/occupancy > 0, minBits in [1,62]: " +
        s"$n/$tables/$targetOccupancy/$minBits")
    // overflow-safe: past Long.MaxValue/tables the key count already
    // saturates the 62-bit cap for any occupancy dial worth using
    val keys =
      if (n > Long.MaxValue / tables) Long.MaxValue
      else n * tables / targetOccupancy
    val ceilLog2 =
      if (keys <= 1L) 1
      else 64 - java.lang.Long.numberOfLeadingZeros(keys - 1)
    math.min(62, math.max(minBits, ceilLog2))
  }

  /** [[semanticNearDupPairs]] with SRP (seeded random hyperplane)
    * candidate buckets instead of raw sign bands — the documented
    * handoff PAST the sign family's dimension ceiling (r16 ladder
    * finding): sign bands read `bands × bandBits` raw dimension
    * signs, so their bucket key space is capped at 2^(d/bands) and
    * candidate volume goes n²-shaped once n outgrows it. SRP buckets
    * ([[graft.functions.SrpBuckets]], the q41 ANN machinery) project
    * onto seeded hyperplanes, so `bits` grows with n indefinitely —
    * the production dial is [[srpBitsFor]] (bits ≈ log2(n · tables /
    * target bucket occupancy), the ladder's 12→14→16). The DECISION
    * gate is byte-identical to
    * [[semanticDedup]]'s (same int8 codes, same BIGINT cosine
    * inequality), so the two variants differ only in candidate
    * recall; the float hyperplane projections are why this form has
    * no DuckDB replay (q81/q150 keep the sign-band form for the
    * oracle gate — a documented trade, not a gap). */
  def semanticNearDupPairsSrp(corpus: DataFrame, tables: Int = 8,
                              bits: Int = 12, seed: Long = 2025L,
                              simNumSqE4: Long = 2025L,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    graft.functions.SrpBuckets.register(corpus.sparkSession)
    graft.functions.IntDot.register(corpus.sparkSession)
    require(simNumSqE4 >= 0L && simNumSqE4 <= 10000L,
      s"simNumSqE4 is t^2 * 1e4, must be in [0,10000]: $simNumSqE4")
    corpus.select(col(vecCol)).head(1).headOption.foreach { r =>
      val d = r.getSeq[Any](0).size
      require(d <= MaxSemanticDedupDim,
        s"the integer gate (dot^2 * 1e4 in BIGINT) is safe only for " +
          s"dims <= $MaxSemanticDedupDim; got $d")
    }
    val coded = quantizeInt8(corpus, vecCol)
      .withColumn("c", expr("transform(q, v -> cast(v as bigint))"))
      .withColumn("ss", expr("int_dot(c, c)"))
    // (table, bucket) key via posexplode: bucket values are per-table
    // bit patterns, so the table index must ride the join key
    val sigs = coded.select(col(idCol).as("vid"),
        posexplode(call_function("srp_buckets",
          col(vecCol), lit(tables), lit(bits), lit(seed)))
          .as(Seq("band", "bkt")))
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.bkt") === col("b.bkt") &&
        col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("d1"), col("b.vid").as("d2"))
      .dropDuplicates("d1", "d2")
    val side1 = coded.select(col(idCol).as("d1"), col("c").as("c1"), col("ss").as("ss1"))
    val side2 = coded.select(col(idCol).as("d2"), col("c").as("c2"), col("ss").as("ss2"))
    cand.join(side1, "d1").join(side2, "d2")
      .withColumn("dot", expr("int_dot(c1, c2)"))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(10000L) >= lit(simNumSqE4) * col("ss1") * col("ss2"))
      .select(col("d1"), col("d2"), col("dot"), col("ss1"), col("ss2"))
  }

  /** The EXACT gated pair set — every (d1 < d2) pair satisfying
    * [[semanticDedup]]'s int8 BIGINT cosine inequality, scored by an
    * all-pairs self-join. O(n²) by construction: the brute-force
    * ORACLE leg (the [[bruteForcePairs]] convention) serving as the
    * recall denominator for the LSH candidate variants; never the
    * scale path. */
  def semanticPairsExact(corpus: DataFrame, simNumSqE4: Long = 2025L,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    require(simNumSqE4 >= 0L && simNumSqE4 <= 10000L,
      s"simNumSqE4 is t^2 * 1e4, must be in [0,10000]: $simNumSqE4")
    graft.functions.IntDot.register(corpus.sparkSession)
    val coded = quantizeInt8(corpus, vecCol)
      .withColumn("c", expr("transform(q, v -> cast(v as bigint))"))
      .withColumn("ss", expr("int_dot(c, c)"))
    val a = coded.select(col(idCol).as("d1"), col("c").as("c1"), col("ss").as("ss1"))
    val b = coded.select(col(idCol).as("d2"), col("c").as("c2"), col("ss").as("ss2"))
    a.join(b, col("d1") < col("d2"))
      .withColumn("dot", expr("int_dot(c1, c2)"))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(10000L) >= lit(simNumSqE4) * col("ss1") * col("ss2"))
      .select(col("d1"), col("d2"), col("dot"), col("ss1"), col("ss2"))
  }

  /** [[semanticDedup]]'s keep-first rule over an externally-supplied
    * gated pair frame (d1 < d2) — lets callers memoize the expensive
    * pair leg once and fold it multiple ways. */
  def keepFirstFromPairs(corpus: DataFrame, pairs: DataFrame,
                         idCol: String = "vec_id"): DataFrame =
    corpus.select(col(idCol))
      .join(pairs.groupBy(col("d2").as(idCol))
        .agg(min(col("d1")).as("dup_of")), Seq(idCol), "left")
      .select(col(idCol),
        col("dup_of").isNull.cast("long").as("kept"),
        col("dup_of"))

  /** The gated near-dup PAIRS of [[semanticDedup]] — identical
    * candidate generation and BIGINT cosine gate, emitted as
    * (d1 < d2, dot, ss1, ss2) rows instead of being folded into the
    * keep-first rule. The building block for pair-level consumers:
    * cross-lingual near-dup detection (q150), cluster construction,
    * audit joins. */
  def semanticNearDupPairs(corpus: DataFrame, bands: Int = 8,
                           bandBits: Int = 6, simNumSqE4: Long = 2025L,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame =
    semanticDedup(corpus, bands, bandBits, simNumSqE4, idCol, vecCol,
      pairsOnly = true)

  /** Route decision for [[semanticNearDupPairsAuto]] — (family, dial):
    * `("signband", bandBits)` while the sign family's DIMENSION
    * CEILING admits the bandBits the occupancy dial wants, else
    * `("srp", bits)` with [[srpBitsFor]]'s dial. The wanted width is
    * `ceil(log2(n / signBandOccupancy))` (per-band bucket occupancy,
    * the same law as SRP's — occupancy ≈ n/2^bits); the ceiling is
    * `min(16, dim/bands)` because sign bands read RAW dimension signs
    * (bands × bandBits positions must exist) where SRP projects onto
    * seeded hyperplanes and grows indefinitely. The defaults
    * REPRODUCE the measured ladder exactly — the q150 fixture
    * (dim 64, 8 bands) routes (2000 → signband/6, 8000 → signband/8,
    * 32000 → srp/16): the first two are the dials the 1×/4× cells ran
    * zero-spill, the third is the cell where the capped sign form
    * spilled 5.6 GB and the SRP form spilled zero (ARCHITECTURE r17
    * ladder; the partition-count alternative was tested and REFUTED).
    * signBandOccupancy = 32 is the measured-fine 1× operating point —
    * sign-band tolerates deeper buckets than SRP's target-4 because
    * its per-band candidate volume n·occ stays small at small n. */
  def semanticRouteFor(n: Long, dim: Int, bands: Int = 8,
                       signBandOccupancy: Long = 32L, tables: Int = 8,
                       srpOccupancy: Long = 4L): (String, Int) = {
    require(n >= 0 && dim >= 1 && bands >= 1 && signBandOccupancy > 0,
      s"need n >= 0, dim/bands >= 1, occupancy > 0: $n/$dim/$bands/$signBandOccupancy")
    val maxBandBits = math.min(16, dim / bands)
    val keys = n / signBandOccupancy
    val wanted =
      if (keys <= 1L) 1
      else 64 - java.lang.Long.numberOfLeadingZeros(keys - 1)
    if (wanted <= maxBandBits) ("signband", math.max(1, wanted))
    else ("srp", srpBitsFor(n, tables, srpOccupancy))
  }

  /** [[semanticNearDupPairs]] with the sign-band → SRP handoff made
    * AUTOMATIC (r18, VERDICT r17 item 5): the caller asks for gated
    * near-dup pairs at a volume, and [[semanticRouteFor]] picks the
    * candidate family — raw sign bands while their dimension ceiling
    * admits the occupancy-holding bit width (the oracle-replayable
    * form, zero extra cost), SRP hyperplane buckets past it (the
    * zero-spill form at the volume where the capped sign family
    * degrades to spilling its self-join sort). Both families feed the
    * IDENTICAL int8 BIGINT cosine gate, so the output schema and gate
    * semantics never change across the handoff — only candidate
    * recall characteristics do (equivalence with the directly-dialed
    * forms pinned in Round18Spec on both sides of the boundary).
    *
    * `nOpt`: the corpus size if the caller knows it (a catalog count
    * at 100 TB); None counts `idCol` (one column-pruned pass). */
  def semanticNearDupPairsAuto(corpus: DataFrame, bands: Int = 8,
                               simNumSqE4: Long = 2025L,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               tables: Int = 8, seed: Long = 2025L,
                               signBandOccupancy: Long = 32L,
                               srpOccupancy: Long = 4L,
                               nOpt: Option[Long] = None): DataFrame = {
    val n = nOpt.getOrElse(corpus.select(col(idCol)).count())
    val dim = corpus.select(col(vecCol)).head(1).headOption
      .map(_.getSeq[Any](0).size).getOrElse(0)
    require(dim >= 1, s"cannot route an empty corpus without dims")
    semanticRouteFor(n, dim, bands, signBandOccupancy, tables,
        srpOccupancy) match {
      case ("signband", bandBits) =>
        semanticNearDupPairs(corpus, bands, bandBits, simNumSqE4,
          idCol, vecCol)
      case (_, bits) =>
        semanticNearDupPairsSrp(corpus, tables, bits, seed, simNumSqE4,
          idCol, vecCol)
    }
  }
}
