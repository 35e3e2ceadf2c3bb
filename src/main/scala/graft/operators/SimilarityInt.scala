package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** INTEGER-EXACT product quantization and IVF — the r19 VERDICT's
  * remaining correctness tier: [[Similarity.pqTopK]]/[[Similarity
  * .ivfPqTopK]] are float pipelines (decimal-deterministic WITHIN
  * Spark, but k-means means and cosine reranks carry engine-specific
  * float reductions no DuckDB oracle can replay), so their registered
  * queries sat at rows-only checks with pinned recall companions.
  * This family re-expresses the SAME index structures — PQ/ADC
  * (Jégou et al. TPAMI 2011 §IV), IVF-flat, and IVFADC (§V) — over
  * integer-quantized NORMALIZED vectors, where every training step,
  * every distance, and the final ranking are exact BIGINT arithmetic:
  * the full top-k output replays bit-for-bit in DuckDB (the q81
  * `semanticDedup` recipe applied to the whole index family, r20).
  *
  * The coding: z_i = round(Scale · x_i / ‖x‖₂) — int codes of the
  * L2-NORMALIZED vector, so ‖z‖ ≈ Scale for every vector and squared
  * L2 over z ranks like cosine over x (the [[Similarity.l2Normalize]]
  * identity, quantized); the exact-integer dot over z is the rerank
  * metric. The ONLY float work is the per-row coding chain (widen →
  * square → left-to-right sum → sqrt → divide → scale → round): every
  * op is a correctly-rounded IEEE-754 double op in a FIXED order, so
  * both engines compute bit-identical doubles and round them to the
  * same integers (the q74/q130 "fixed op chain" rule). Everything
  * after the coding is integer.
  *
  * Cross-engine determinism inventory (each item has a house
  * precedent): seeded draws order by md5 hex strings ([[graft.ops
  * .Md5Key]]'s convention — xxhash64 is engine-internal), k-means
  * centroid updates are sign-split TRUNCATING integer means
  * ([[Spectral]]'s rescale spelling), argmins tie-break on centroid
  * id ascending, shortlists and ranks tie-break on neighbor id
  * ascending. Quantization costs recall precision vs the float forms
  * (~1e-4 relative on each coordinate — far below the codebooks' own
  * quantization error); the float forms remain the API for callers
  * who want them ([[Similarity]]), with their specs intact.
  *
  * Scale shape is unchanged from the float family: codebooks and
  * LUTs broadcast, the corpus side of every shuffle carries ids +
  * small ints only, training runs on md5-bounded samples
  * (corpus-size-free), and int64 codes are HALF the bytes of float64
  * through every exchange.
  */
object SimilarityInt {

  /** Code scale: z ∈ [−Scale, Scale] per coordinate. 10⁴ keeps every
    * downstream product comfortably inside int64 — dot ≤ d·10⁸ (d ≤
    * ~9·10⁹ dims before overflow), per-sub d2 ≤ dsub·4·10⁸ — while
    * quantization noise (½ulp/Scale ≈ 5e-5 per coordinate) sits well
    * under PQ's own codebook error. */
  val Scale = 10000

  /** (vid, z array<bigint>): the integer-normalized coding. The norm
    * accumulates strictly left-to-right from a 0.0 seed (bitwise
    * equal to DuckDB's seedless list_reduce on non-negative terms);
    * constant/zero vectors keep direction 0 via the 1e-30 guard
    * (the [[Similarity.l2Normalize]] stance). */
  def zCodes(df: DataFrame, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    df
      .withColumn("_nrm", expr(
        s"sqrt(aggregate(transform($vecCol, v -> cast(v as double) * v), " +
          "0d, (a, p) -> a + p))"))
      .select(col(idCol).as("vid"), expr(
        s"transform($vecCol, x -> cast(round(cast(x as double) / " +
          s"greatest(_nrm, 1e-30d) * $Scale.0d) as bigint))").as("z"))

  /** md5-hex draw key — lexicographic order on the lowercase hex IS
    * numeric order (fixed width), and both engines ship identical
    * md5, so `ORDER BY h, vid LIMIT n` is the same sample everywhere
    * (the [[graft.ops.Md5Key]] convention; seeds stream by
    * seed-suffix). */
  private def mdKey(id: Column, seed: Long): Column =
    md5(concat_ws(":", id.cast("string"), lit(seed.toString)))

  /** Exact squared-L2 / dot over two bigint arrays, in-row — the
    * native codegen'd kernels ([[graft.functions.IntL2Sq]]/
    * [[graft.functions.IntDot]]): the HOF `aggregate(zip_with(...))`
    * formulation they replace measured the whole q43 int-vs-float gap
    * (762 vs 224 cs at sf0.1 — interpreted lambda machinery per
    * (vector, centroid) pair; ARCHITECTURE r20). Identical exact
    * semantics, spec-pinned against the HOF form. */
  private def d2Sql(a: String, b: String): String = s"int_l2sq($a, $b)"
  private def dotSql(a: String, b: String): String = s"int_dot($a, $b)"

  private def registerKernels(df: DataFrame): Unit = {
    graft.functions.IntL2Sq.register(df.sparkSession)
    graft.functions.IntDot.register(df.sparkSession)
  }

  /** Split a z vector into its m subvectors: (…, sub, sv) — the
    * [[Similarity.subvectors]] split with the same loud in-plan
    * divisibility guard. */
  private def subZ(df: DataFrame, m: Int): DataFrame =
    df
      .withColumn("_zck", when(expr(s"pmod(size(z), $m) != 0"),
        expr(s"cast(raise_error(concat('PQ-int: vector dim ', size(z), " +
          s"' not divisible by m=$m')) as array<bigint>)"))
        .otherwise(col("z")))
      .select(col("*"), explode(expr(
        s"transform(sequence(0, ${m - 1}), _s -> struct(_s as sub, " +
          s"slice(_zck, _s * (size(_zck) div $m) + 1, size(_zck) div $m) as sv))"))
        .as("p"))
      .withColumn("sub", col("p.sub")).withColumn("sv", col("p.sv"))
      .drop("p", "z", "_zck")

  /** Per-(vid, sub) nearest-centroid assignment: argmin exact d2,
    * cid-ascending tie-break — deterministic on every partitioning
    * AND replayable (row_number over (d2, cid) in the oracle). */
  private def assignSub(subvecs: DataFrame, cents: DataFrame): DataFrame =
    subvecs.join(broadcast(cents), Seq("sub"))
      .withColumn("d2", expr(d2Sql("sv", "cvec")))
      .groupBy("vid", "sub")
      .agg(max_by(col("cid"), struct((-col("d2")).as("nd"),
        (-col("cid")).as("nc"))).as("cid"),
        first(col("sv")).as("sv"))

  /** One integer Lloyd step: per-(sub, cid, pos) sign-split TRUNCATED
    * mean (`s div n` with an explicit negative branch — Spark's div
    * and DuckDB's `//` agree only on non-negative operands; the
    * [[Spectral]] rescale spelling). Empty centroids drop. */
  private def lloydStep(train: DataFrame, cents: DataFrame): DataFrame =
    assignSub(train, cents)
      .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy("sub", "cid", "pos")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("mu", when(col("s") < 0, -expr("(-s) div n"))
        .otherwise(expr("s div n")))
      .groupBy("sub", "cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
      .select(col("sub"), col("cid"), expr("transform(pm, q -> q.mu)").as("cvec"))

  /** Integer PQ codebooks: (sub, cid, cvec array<bigint>) — cid is
    * the seed row's own vid (no global row_number; the
    * [[Similarity.ivfBuildIndex]] id convention). */
  case class IntCodebook(centroids: DataFrame, m: Int, ksub: Int)

  /** Train integer PQ codebooks over a (vid, z) frame: md5-smallest
    * ksub seed rows, md5-bounded 256·ksub training sample (disjoint
    * seed stream), `iters` integer Lloyd steps. Memoized — the
    * codebook feeds several broadcasts ([[Similarity.pqTrain]]'s
    * reasoning). */
  def pqTrainInt(z: DataFrame, m: Int, ksub: Int, iters: Int,
                 seed: Long, memoKey: String): IntCodebook = {
    require(m >= 1 && ksub >= 2 && iters >= 0,
      s"bad PQ-int dials: m=$m ksub=$ksub iters=$iters")
    registerKernels(z)
    val seeds = subZ(
      z.withColumn("h", mdKey(col("vid"), seed))
        .orderBy("h", "vid").limit(ksub).drop("h"), m)
      .select(col("sub"), col("vid").as("cid"), col("sv").as("cvec"))
    // r21: materialize the bounded training sample once — each Lloyd
    // step's lazy plan otherwise re-pays the corpus md5 top-n draw per
    // step (`train` is referenced once per iteration). The sample is
    // ≤ 256·ksub·m rows by construction, so the checkpoint is tiny.
    val train = subZ(
      z.withColumn("h", mdKey(col("vid"), seed + 1))
        .orderBy("h", "vid").limit(256 * ksub).drop("h"), m)
      .localCheckpoint(true)
    var cents = seeds
    for (_ <- 1 to iters) cents = lloydStep(train, cents)
    val done = graft.ops.Memo.of(z.sparkSession, memoKey)(cents)
    IntCodebook(done, m, ksub)
  }

  /** Encode a (vid, z) frame against frozen codebooks:
    * (vid, sub, code) — m small ints per vector. */
  def pqEncodeInt(z: DataFrame, cb: IntCodebook): DataFrame = {
    registerKernels(z)
    assignSub(subZ(z, cb.m), cb.centroids)
      .select(col("vid"), col("sub"), col("cid").as("code"))
  }

  /** The shared integer rerank tail: exact z-dot the candidate pairs,
    * keep the per-query top-k — (query_id, neighbor_id, rank). */
  private def rerankByDot(candidates: DataFrame, z: DataFrame,
                          queriesZ: DataFrame, k: Int): DataFrame = {
    val qv = queriesZ.select(col("vid").as("query_id"), col("z").as("qz"))
    val cv = z.select(col("vid").as("neighbor_id"), col("z").as("cz"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    candidates
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("dot", expr(dotSql("qz", "cz")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Integer ADC top-k ([[Similarity.pqTopK]]'s contract): one
    * m×ksub exact-integer distance table per query, adist = m BIGINT
    * lookups summed (order-free — integer addition is associative,
    * the reason the decimal crutch of the float form isn't needed),
    * shortlist of `rerank` by (adist, neighbor_id), exact z-dot
    * rerank. Every row of the output replays in DuckDB. */
  def pqTopKInt(codes: DataFrame, cb: IntCodebook, z: DataFrame,
                queriesZ: DataFrame, k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    registerKernels(z)
    val table = subZ(queriesZ, cb.m)
      .withColumnRenamed("vid", "query_id")
      .join(broadcast(cb.centroids), Seq("sub"))
      .withColumn("d2", expr(d2Sql("sv", "cvec")))
      .select(col("query_id"), col("sub"), col("cid").as("code"), col("d2"))
    val wa = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val shortlist = codes
      .select(col("vid").as("neighbor_id"), col("sub"), col("code"))
      .join(broadcast(table), Seq("sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("d2")).as("adist"))
      .withColumn("ar", row_number().over(wa))
      .filter(col("ar") <= rerank)
      .select("query_id", "neighbor_id")
    rerankByDot(shortlist, z, queriesZ, k)
  }

  /** Integer IVF index: full-dim centroids (cid, cvec) + clustered
    * lists (vid, z, list_id). Routing is argmin exact d2 — on the
    * fixed-norm z coding that IS the cosine routing of the float
    * form, minus the last-ulp engine dependence. */
  case class IntIvfIndex(centroids: DataFrame, lists: DataFrame)

  /** Full-dim integer k-means + corpus clustering — the
    * [[Similarity.ivfBuildIndex]] machinery on z codes. */
  def ivfBuildInt(z: DataFrame, nlist: Int, iters: Int, seed: Long,
                  memoKey: String): IntIvfIndex = {
    require(nlist >= 1 && iters >= 0, s"bad IVF-int dials: $nlist/$iters")
    registerKernels(z)
    // full-dim k-means = the m=1 subspace problem; reuse the sub
    // machinery with one subvector covering the whole vector
    val seeds = z.withColumn("h", mdKey(col("vid"), seed))
      .orderBy("h", "vid").limit(nlist)
      .select(lit(0).as("sub"), col("vid").as("cid"), col("z").as("cvec"))
    // r21: sample materialized once (the pqTrainInt rationale) —
    // ≤ 256·nlist rows, one corpus draw instead of one per Lloyd step
    val train = z.withColumn("h", mdKey(col("vid"), seed + 1))
      .orderBy("h", "vid").limit(256 * nlist)
      .select(lit(0).as("sub"), col("vid"), col("z").as("sv"))
      .localCheckpoint(true)
    var cents = seeds
    for (_ <- 1 to iters) cents = lloydStep(train, cents)
    val done = graft.ops.Memo.of(z.sparkSession, memoKey)(
      cents.select(col("cid"), col("cvec")))
    val lists = z.select(lit(0).as("sub"), col("vid"), col("z").as("sv"))
      .transform(sv => assignSub(sv,
        done.select(lit(0).as("sub"), col("cid"), col("cvec"))))
      .select(col("vid"), col("sv").as("z"), col("cid").as("list_id"))
    IntIvfIndex(done, lists)
  }

  /** Integer IVF-flat top-k: probe the `nprobe` d2-nearest lists per
    * query, exact z-dot their members, per-query top-k. Fully
    * replayable — candidate volume is nprobe/nlist of the corpus by
    * construction (the [[Similarity.ivfTopK]] scale argument). */
  def ivfTopKInt(index: IntIvfIndex, queriesZ: DataFrame, z: DataFrame,
                 k: Int, nprobe: Int): DataFrame = {
    registerKernels(z)
    val wq = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("cid").asc)
    val probes = queriesZ
      .select(col("vid").as("query_id"), col("z").as("qz"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("d2", expr(d2Sql("qz", "cvec")))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("cid").as("list_id"))
    val candidates = index.lists
      .select(col("vid").as("neighbor_id"), col("list_id"))
      .join(probes.hint("broadcast"), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    rerankByDot(candidates, z, queriesZ, k)
  }

  /** Integer IVFADC index: coarse centroids route, residual PQ codes
    * store — (vid, list_id, sub, code), m+1 small ints per vector
    * (the [[Similarity.IvfPqIndex]] layout, integer-exact). */
  case class IntIvfPqIndex(centroids: DataFrame, codebook: IntCodebook,
                           codes: DataFrame)

  /** Build: integer coarse k-means (seed / seed+1 streams), integer
    * residuals r = z − centroid (their magnitude IS the signal — not
    * re-coded), residual PQ codebooks (seed+2 / seed+3 streams), one
    * encode pass carrying list_id through the argmax keys. */
  def ivfPqBuildInt(z: DataFrame, nlist: Int, m: Int, ksub: Int,
                    iters: Int, seed: Long, memoKey: String): IntIvfPqIndex = {
    registerKernels(z)
    val ivf = ivfBuildInt(z, nlist, iters, seed, memoKey + ":coarse")
    // r21: materialize the residuals once — they are read three times
    // (PQ seed draw, PQ training draw, the encode pass), and each lazy
    // reference otherwise re-runs the full-corpus list assignment the
    // residuals derive from. One row per vector (m+1 small ints after
    // encode; d ints here), corpus-sized but narrow — the same
    // build-artifact stance as the memoized centroids.
    val resid = ivf.lists
      .join(broadcast(ivf.centroids), col("list_id") === col("cid"))
      .select(col("vid"), col("list_id"),
        expr("zip_with(z, cvec, (a, b) -> a - b)").as("z"))
      .localCheckpoint(true)
    val cb = pqTrainInt(resid.select("vid", "z"), m, ksub, iters,
      seed + 2, memoKey + ":pq")
    val codes = subZ(resid, m)
      .join(broadcast(cb.centroids), Seq("sub"))
      .withColumn("d2", expr(d2Sql("sv", "cvec")))
      .groupBy("vid", "list_id", "sub")
      .agg(max_by(col("cid"), struct((-col("d2")).as("nd"),
        (-col("cid")).as("nc"))).as("code"))
      .select("vid", "list_id", "sub", "code")
    IntIvfPqIndex(ivf.centroids, cb, codes)
  }

  /** Integer IVFADC search ([[Similarity.ivfPqTopK]]'s contract):
    * nprobe d2-nearest lists, one m×ksub RESIDUAL distance table per
    * (query, probed list), adist over probed code rows, shortlist,
    * exact z-dot rerank. Bit-replayable end to end. */
  def ivfPqTopKInt(index: IntIvfPqIndex, queriesZ: DataFrame,
                   z: DataFrame, k: Int, nprobe: Int,
                   rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    registerKernels(z)
    val wq = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("cid").asc)
    val probes = queriesZ
      .select(col("vid").as("query_id"), col("z").as("qz"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("d2", expr(d2Sql("qz", "cvec")))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("query_id").as("vid"), col("cid").as("list_id"),
        expr("zip_with(qz, cvec, (a, b) -> a - b)").as("z"))
    val table = subZ(probes, index.codebook.m)
      .join(broadcast(index.codebook.centroids), Seq("sub"))
      .withColumn("d2", expr(d2Sql("sv", "cvec")))
      .select(col("vid").as("query_id"), col("list_id"), col("sub"),
        col("cid").as("code"), col("d2"))
    val wa = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val shortlist = index.codes
      .select(col("vid").as("neighbor_id"), col("list_id"), col("sub"),
        col("code"))
      .join(broadcast(table), Seq("list_id", "sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("d2")).as("adist"))
      .withColumn("ar", row_number().over(wa))
      .filter(col("ar") <= rerank)
      .select("query_id", "neighbor_id")
    rerankByDot(shortlist, z, queriesZ, k)
  }
}
