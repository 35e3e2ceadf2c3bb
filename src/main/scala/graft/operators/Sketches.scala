package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Md5Key

/** Bounded-state cardinality sketching as a reusable operator — the
  * generic form of q141, shared verbatim by the batch query and the
  * streaming view because the plan is the same declarative aggregate
  * either way.
  *
  * Streaming is the point of the design: a KMV sketch's state is
  * [[graft.functions.BoundedMinKDistinct]]'s k-capped set buffer, and
  * Structured Streaming keeps exactly that buffer per group in the
  * state store, merging each micro-batch's partial through the
  * aggregate's own `merge` — so a continuously-maintained distinct
  * estimate costs O(k) state per group FOREVER, where streaming
  * `approx_count_distinct` state is engine-opaque and exact streaming
  * `countDistinct` is unsupported precisely because its state is
  * unbounded. Set semantics across micro-batches come for free: a
  * value re-arriving in a later batch hashes to an already-held
  * minimum and the buffer doesn't move.
  */
object Sketches {

  /** The raw per-group KMV sketch: `hs` = the k smallest distinct
    * [[Md5Key]] hashes of `idCol`, ascending. This IS the sketch
    * state — [[kmvDistinctEstimate]] reads a cardinality off it and
    * [[kmvPairAlgebra]] runs set algebra over pairs of them, so a
    * corpus-sized input is reduced ONCE and every downstream estimate
    * works on ≤ k·|groups| rows. */
  def kmvHeads(df: DataFrame, groupCol: String, idCol: String,
               k: Int = 64): DataFrame = {
    graft.functions.BoundedMinKDistinct.register(df.sparkSession)
    df
      .select(col(groupCol),
        expr(s"substr(md5(cast($idCol as string)), 1, 15)").as("hx"))
      .withColumn("hv", expr(Md5Key.hex15ToLongSpark("hx")))
      .groupBy(groupCol)
      .agg(expr(s"bounded_min_k_distinct(hv, $k)").as("hs"))
  }

  /** The estimator columns over a [[kmvHeads]] frame: `n_heads` (≤ k),
    * `kth_hash` (NULL below k), `est_distinct` — exact below k, else
    * `(k−1)·2⁶⁰ div h_k` (Beyer et al. SIGMOD'07). All integer
    * arithmetic, so it sits under the DuckDB hash gate (q141). */
  def kmvEstimateFromHeads(heads: DataFrame, groupCol: String,
                           k: Int): DataFrame =
    heads.select(col(groupCol),
      size(col("hs")).cast("long").as("n_heads"),
      expr(s"CASE WHEN size(hs) = $k THEN element_at(hs, $k) END")
        .as("kth_hash"),
      expr(s"CASE WHEN size(hs) < $k THEN cast(size(hs) as bigint) " +
        s"ELSE cast(cast(${k - 1} as decimal(19,0)) * ${Md5Key.Space} " +
        s"div greatest(element_at(hs, $k), 1) as bigint) END")
        .as("est_distinct"))

  /** Per-group KMV distinct-cardinality estimate over `idCol`
    * (any SQL expression yielding a stable string/number per element).
    *
    * Batch: call on any DataFrame. Streaming: call on a streaming
    * DataFrame and write with Complete (or Update) output mode — the
    * result is the continuously-maintained estimate per group.
    * The batch form sits under the DuckDB hash gate (q141's oracle)
    * and the streaming form equals it row-for-row. */
  def kmvDistinctEstimate(df: DataFrame, groupCol: String, idCol: String,
                          k: Int = 64): DataFrame =
    kmvEstimateFromHeads(kmvHeads(df, groupCol, idCol, k), groupCol, k)

  /** KMV set algebra: for every unordered pair of groups, estimate the
    * distinct-element UNION, INTERSECTION, and Jaccard of the two
    * groups' id sets purely from their k-min sketches — the
    * sketch-side swap for an exact pairwise-overlap self-join
    * ([[graft.ops.EventQueries]] q155 vs q160).
    *
    * The algebra (Beyer et al., SIGMOD 2007 §4): the k smallest
    * hashes of A ∪ B are computable from K(A) ∪ K(B) alone (any
    * union hash below either sketch's k-th minimum is in one of the
    * sketches), so `union_k = first k of sort(distinct(K(A)+K(B)))`
    * is itself a valid KMV sketch of the union → `est_union` by the
    * usual estimator. Within union_k, the fraction ρ of hashes
    * present in BOTH sketches is an unbiased estimate of the Jaccard
    * ratio → `est_inter = ρ · est_union`, `jaccard_est_permille =
    * ρ · 1000`. Below k everything degenerates to EXACT set algebra
    * (each sketch then holds the group's entire hash set).
    *
    * Scale: the input frame is touched once ([[kmvHeads]] — a bounded
    * native aggregate, map-side capped at k); the pair algebra runs
    * on the |groups|-row sketch frame, broadcast, each pair costing
    * O(k log k) in-row array work. C(|groups|, 2) pairs of 100 TB id
    * sets become C(|groups|, 2) pairs of 64-element arrays.
    * Determinism: hashes are [[Md5Key]] integers and every estimator
    * is integer division — a pure function of the id SETS, so the
    * whole frame (estimates included) sits under the DuckDB hash
    * gate, merge order and partitioning invisible. */
  def kmvPairAlgebra(heads: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = heads.select(col(groupCol).as("t1"), col("hs").as("hs1"))
    val b = heads.select(col(groupCol).as("t2"), col("hs").as("hs2"))
    a.join(broadcast(b), col("t1") < col("t2"))
      .withColumn("u", slice(array_sort(array_distinct(
        concat(col("hs1"), col("hs2")))), 1, k))
      .withColumn("n_u", size(col("u")))
      .withColumn("n_i",
        size(array_intersect(col("u"), array_intersect(col("hs1"), col("hs2")))))
      .select(col("t1"), col("t2"),
        col("n_u").cast("long").as("n_union_heads"),
        expr(s"CASE WHEN n_u < $k THEN cast(n_u as bigint) " +
          s"ELSE cast(cast(${k - 1} as decimal(19,0)) * ${Md5Key.Space} " +
          s"div greatest(element_at(u, $k), 1) as bigint) END")
          .as("est_union"),
        col("n_i").cast("long").as("n_inter_heads"),
        expr(s"cast(cast(n_i as decimal(19,0)) * (CASE WHEN n_u < $k " +
          s"THEN cast(n_u as bigint) " +
          s"ELSE cast(cast(${k - 1} as decimal(19,0)) * ${Md5Key.Space} " +
          s"div greatest(element_at(u, $k), 1) as bigint) END) " +
          s"div greatest(n_u, 1) as bigint)").as("est_inter"),
        expr("n_i * 1000 div greatest(n_u, 1)").cast("long")
          .as("jaccard_est_permille"))
  }

  /** Each input row fanned out to its `d` count-min (row, bucket)
    * coordinates, with `carry` columns riding along. ONE md5 digest
    * per input row (r18): the 32-hex digest is materialized once and
    * hash row `r` reads its own disjoint 4-hex slice at offset
    * `1 + 4r` ([[Md5Key.hexToLongAt]]) — the d-separate-digests form
    * this replaces cost d× the md5 volume for the same independence
    * (md5 avalanche decorrelates slices exactly as it decorrelated
    * seeds), and the earlier q143/q144/q147 lesson still applies: the
    * digest must be a materialized COLUMN, never an md5 call embedded
    * in each polynomial term (re-evaluated per digit). Tag-keyed md5
    * keeps the bucketing a pure function of the key, so an oracle (or
    * another engine's sketch) rebuilds the identical counters by
    * replaying the same slice offsets. */
  def withCmBuckets(df: DataFrame, keyCol: String, tag: String,
                    d: Int, w: Int, carry: Seq[String]): DataFrame = {
    require(d >= 1 && d <= 8,
      s"d must be in [1,8] (8 disjoint 4-hex slices per md5 digest), got $d")
    df.withColumn("_hx", expr(s"md5(cast($keyCol as string) || ':$tag')"))
      .select(carry.map(col) :+
        posexplode(array((0 until d).map { r =>
          expr(s"(${Md5Key.hexToLongSparkAt("_hx", 1 + 4 * r, 4)}) % $w")
        }: _*)).as(Seq("r", "b")): _*)
  }

  /** The count-min sketch itself: `d × w` exact BIGINT counters over
    * `keyCol` — q143's build as a reusable operator, shared verbatim
    * by batch and streaming for the same reason as
    * [[kmvDistinctEstimate]]: the sketch state IS a bounded group-by
    * (≤ d·w counter rows, each a combinable count), so in
    * Complete/Update mode Structured Streaming keeps exactly those
    * counters in the state store and a continuously-maintained
    * frequency sketch costs O(d·w) state FOREVER — while two corpora's
    * sketches (or two micro-batches' partials) merge by plain counter
    * addition, the property that makes count-min the standard
    * distributed heavy-hitter primitive. Point estimates probe
    * `min` over the d counters ([[graft.ops.EventQueries.q143CountMin]]
    * wires the probe side and the never-underestimate certificate). */
  def countMinCounters(df: DataFrame, keyCol: String, tag: String = "cm",
                       d: Int = 3, w: Int = 64): DataFrame =
    withCmBuckets(df, keyCol, tag, d, w, Seq.empty)
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))

  /** α numerator factor `7213·m³` of the integer-exact HLL estimator
    * (`est = 7213·m³·2⁶² div ((10000·m + 10790)·S)`), exposed so the
    * DuckDB oracle SQL interpolates the SAME literal the engine
    * computes — the two sides must never hand-maintain this constant
    * independently (an r17 oracle had it off by 2¹⁷, ~1.08e-6
    * relative, enough to flip the floor division on ~3% of
    * cardinalities; ADVICE r17 high). */
  def hllAlphaNum(b: Int): BigInt = {
    require(b >= 7 && b <= 15,
      s"b must be in [7,15] (m >= 128 for the closed-form alpha), got $b")
    BigInt(7213) * BigInt(1L << b).pow(3)
  }

  /** α denominator `10000·m + 10790` of the same estimator — exposed
    * for the identical one-source-of-truth reason as [[hllAlphaNum]]
    * (ADVICE r20: q209's oracle hand-carried 2570790 and the route
    * floor 640; a b/k change on one side would silently desync). */
  def hllAlphaDen(b: Int): Long = 10000L * (1L << b) + 10790L

  /** Register-index split divisor: `hv div 2^(60−b)` is the top-b-bit
    * register index of a [[graft.ops.Md5Key]] 60-bit hash. */
  def hllRegisterSplit(b: Int): Long = 1L << (60 - b)

  /** The q195/q209 regime-route floor: an HLL raw estimate at or
    * under `5m/2` with empty registers sits in the small-range hole
    * (measured ~10× low on this fixture, r20) — route to KMV. */
  def hllRouteFloor(b: Int): Long = 5L * (1L << b) / 2

  /** HyperLogLog register table per group: ≤ `m = 2^b` rows of
    * (group, `j`, `mr`) where `j` is the register index (top `b` bits
    * of the 60-bit [[Md5Key]] hash of `keyExpr`) and `mr` the register
    * value — max over the group's elements of 1 + the leading-zero
    * count of the remaining `60−b` hash bits (Flajolet, Fusy,
    * Gandouet, Meunier; AofA 2007). The KMV sketch ([[kmvHeads]])
    * estimates at ±1/√(k−2) from k·64-bit heads and is EXACT below k;
    * HLL is the other end of the state/error dial — ±1.04/√m from m
    * SIX-BIT registers, the standard when groups are many and state
    * is the constraint.
    *
    * The sketch is a pure declarative aggregate —
    * `groupBy(group, j).agg(max(rank))` — which is the whole scale
    * argument: partial aggregation caps map-side state at m rows per
    * (group, partition), the shuffle moves ≤ m·|groups| tiny rows
    * however large the input, duplicate keys need no distinct pass
    * (max is idempotent — re-arrivals of a seen key cannot move a
    * register), and two corpora's register tables (or two
    * micro-batches' partials in Complete/Update-mode Structured
    * Streaming, which keeps exactly this table per group in the state
    * store) merge by elementwise max — the law pinned in Round17Spec.
    * Rank arithmetic is integer-only (`length(bin(w))` is the bit
    * length, identical SQL semantics in DuckDB), so the register
    * table AND every estimator built on it replay under the full
    * cross-engine hash gate (q191) — same stance as q141's KMV
    * estimator, q35/q36's LSH replays. */
  def hllRegisters(df: DataFrame, groupCol: String, keyExpr: String,
                   b: Int = 8): DataFrame = {
    require(b >= 7 && b <= 15,
      s"b must be in [7,15] (m >= 128 for the closed-form alpha), got $b")
    val wBits = 60 - b
    val wSpace = 1L << wBits
    df.select(col(groupCol),
        expr(s"substr(md5(cast(($keyExpr) as string)), 1, 15)").as("hx"))
      .withColumn("hv", expr(Md5Key.hex15ToLongSpark("hx")))
      .select(col(groupCol),
        expr(s"hv div $wSpace").as("j"),
        expr(s"hv % $wSpace").as("w"))
      .groupBy(col(groupCol), col("j"))
      .agg(max(expr(
        s"CASE WHEN w = 0 THEN ${wBits + 1} " +
          s"ELSE ${wBits + 1} - length(bin(w)) END")).as("mr"))
  }

  /** The HLL estimator over a [[hllRegisters]] frame: `n_regs_hit`,
    * `v_zero` (= m − hit: rows for never-hit registers aren't
    * materialized, their 2⁰ harmonic terms are added back here),
    * `max_rank`, and `est_distinct` — the raw HLL estimate
    * `α_m·m²/Σ 2^(−M[j])` computed ENTIRELY in integer arithmetic so
    * it sits under the DuckDB hash gate: the harmonic sum is scaled
    * by 2⁶² (every term `2^(62−M[j])` is an exact BIGINT, summed in
    * DECIMAL(38,0)), and α_m = 0.7213/(1 + 1.079/m) is the exact
    * rational `7213·m / (10000·m + 10790)`, giving
    * `est = 7213·m³·2⁶² div ((10000·m + 10790)·S)` — every
    * intermediate < 10³⁸ for b ≤ 15 (numerator ≤ 7213·2^107 ≈
    * 1.2·10³⁶). Like q141, a pure function of the key SET: merge
    * order, partitioning, and duplication invisible.
    *
    * This is the RAW estimator: the published small-range correction
    * (linear counting `m·ln(m/V)` when est ≤ 5m/2 and V > 0) needs a
    * float ln, which is exactly the cross-engine-coincidence trap the
    * q35 repair was about — and the small-cardinality regime is the
    * KMV sketch's home turf ([[kmvDistinctEstimate]] is EXACT below
    * k there). So the contract is split by regime instead: HLL for
    * large cardinalities (q191's fixture sits in the raw regime at
    * both Verify and bench SFs), KMV below, and `v_zero`/`n_regs_hit`
    * are emitted so a caller can SEE when a group is in the wrong
    * regime (v_zero high ⇒ switch to KMV). */
  def hllEstimateFromRegisters(regs: DataFrame, groupCol: String,
                               b: Int = 8): DataFrame = {
    require(b >= 7 && b <= 15,
      s"b must be in [7,15] (m >= 128 for the closed-form alpha), got $b")
    val m = 1L << b
    val numc = hllAlphaNum(b) * BigInt(2).pow(62)
    val den = hllAlphaDen(b)
    val scale = 1L << 62
    regs.groupBy(groupCol)
      .agg(
        count(lit(1)).cast("long").as("n_regs_hit"),
        max(col("mr")).cast("long").as("max_rank"),
        sum(expr("cast(shiftleft(cast(1 as bigint), cast(62 - mr as int))" +
          " as decimal(38,0))")).as("_s_hit"))
      .select(col(groupCol),
        col("n_regs_hit"),
        (lit(m) - col("n_regs_hit")).cast("long").as("v_zero"),
        col("max_rank"),
        expr(s"cast(cast($numc as decimal(38,0)) div " +
          s"($den * (_s_hit + cast($m - n_regs_hit as decimal(38,0)) * $scale))" +
          s" as bigint)").as("est_distinct"))
  }

  /** Per-group HLL distinct-cardinality estimate of `keyExpr` — the
    * composed form ([[hllRegisters]] → [[hllEstimateFromRegisters]]).
    * Batch only as ONE plan (streaming supports no chained
    * aggregations): the streaming form runs [[hllRegisters]] as the
    * streaming query — the state store holds exactly the register
    * table — and applies [[hllEstimateFromRegisters]] as a batch read
    * over its ≤ m·|groups|-row output (pinned equal to this composed
    * form in Round17Spec). */
  def hllDistinctEstimate(df: DataFrame, groupCol: String,
                          keyExpr: String, b: Int = 8): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCol, keyExpr, b),
      groupCol, b)

  /** Regime-ROUTED distinct estimation (r18): one composed operator
    * that picks the right sketch per group from the sketches' own
    * regime telemetry, turning the documented KMV-below / HLL-above
    * split (see [[hllEstimateFromRegisters]]) into behavior instead
    * of a caller's footnote. The route rule is the published HLL
    * small-range boundary: the raw estimator is biased when
    * `est_raw ≤ 5m/2` with empty registers present (`v_zero > 0`) —
    * the regime where the standard fix is linear counting, whose
    * float `ln` is exactly what the integer-exact gate stance
    * forbids. KMV is the gate-compatible substitute there: EXACT
    * below k and ±1/√(k−2) just above, precisely the small-to-mid
    * cardinality band the boundary admits (5m/2 = 640 at b=8 vs
    * k=64's exact range — production pairs the dials so KMV's
    * accurate band covers the HLL raw hole). Both sketches are
    * one-pass bounded combinable aggregates over the SAME [[Md5Key]]
    * hash; the join and routing run on the |groups|-row estimate
    * frames. Every output column — both estimates, the telemetry,
    * the route decision, the routed estimate — is integer/string
    * exact, so the whole decision sits under the DuckDB hash gate
    * (q195, whose fixture straddles both regimes at every SF).
    *
    * Streaming: run [[kmvHeads]] and [[hllRegisters]] as two
    * streaming aggregates (each is its own one-aggregate state form —
    * the r17 lesson) and apply this routing as a batch read over
    * their bounded outputs. */
  def adaptiveDistinct(df: DataFrame, groupCol: String, keyExpr: String,
                       k: Int = 64, b: Int = 8): DataFrame = {
    val m = 1L << b
    val kmv = kmvDistinctEstimate(df, groupCol, keyExpr, k)
      .select(col(groupCol), col("n_heads"),
        col("est_distinct").as("est_kmv"))
    val hll = hllDistinctEstimate(df, groupCol, keyExpr, b)
      .select(col(groupCol), col("v_zero"), col("est_distinct").as("est_hll"))
    kmv.join(hll, Seq(groupCol))
      .withColumn("route",
        when(col("est_hll") <= lit(5L * m / 2) && col("v_zero") > 0,
          lit("kmv")).otherwise(lit("hll")))
      .withColumn("est_distinct",
        when(col("route") === "kmv", col("est_kmv"))
          .otherwise(col("est_hll")))
  }

  /** [[adaptiveDistinct]]'s PAIR-algebra analog (r18): for every
    * unordered pair of groups, union/intersection estimates routed
    * between the two sketch algebras by the union sketch's own regime
    * telemetry — [[kmvPairAlgebra]] (exact below k; ρ-estimator
    * intersections, the documented precision winner) when the HLL
    * union estimate sits inside the small-range hole
    * (`est_union_hll ≤ 5m/2` with `v_zero_union > 0`),
    * [[hllPairAlgebra]] (bounded 6-bit-register state) above it.
    * Both pair frames ride the same [[Md5Key]] hash of `keyExpr`;
    * the route column and every estimate are integer/string exact,
    * so the whole routed decision sits under the DuckDB hash gate
    * (q196 — fixture straddles both regimes like q195's). */
  def adaptivePairAlgebra(df: DataFrame, groupCol: String, keyExpr: String,
                          k: Int = 64, b: Int = 8): DataFrame = {
    val m = 1L << b
    val kmv = kmvPairAlgebra(kmvHeads(df, groupCol, keyExpr, k), groupCol, k)
      .select(col("t1"), col("t2"), col("n_union_heads"),
        col("est_union").as("est_union_kmv"),
        col("est_inter").as("est_inter_kmv"))
    val hll = hllPairAlgebra(
        hllRegisters(df, groupCol, keyExpr, b), groupCol, b)
      .select(col("t1"), col("t2"), col("v_zero_union"),
        col("est_union").as("est_union_hll"),
        col("est_inter").as("est_inter_hll"))
    kmv.join(hll, Seq("t1", "t2"))
      .withColumn("route",
        when(col("est_union_hll") <= lit(5L * m / 2) &&
          col("v_zero_union") > 0, lit("kmv")).otherwise(lit("hll")))
      .withColumn("est_union",
        when(col("route") === "kmv", col("est_union_kmv"))
          .otherwise(col("est_union_hll")))
      .withColumn("est_inter",
        when(col("route") === "kmv", col("est_inter_kmv"))
          .otherwise(col("est_inter_hll")))
  }

  /** HLL set algebra over a [[hllRegisters]] frame — the q160
    * (KMV pair algebra) counterpart at HLL's state point: for every
    * unordered pair of groups, the UNION cardinality estimate comes
    * from the elementwise-max register vector (exact sketch algebra:
    * the register table of A ∪ B IS max(K(A), K(B)) — the law pinned
    * in Round17Spec), and the INTERSECTION estimate by
    * inclusion–exclusion (`est_A + est_B − est_union`, clamped at 0 —
    * noisier than the union, the documented HLL property; KMV's ρ
    * estimator is the alternative when intersection precision
    * matters). The per-group register map is densified to an m-vector
    * once (`map_from_entries` over the ≤ m-row register table), pairs
    * join on a BROADCAST of the |groups|-row vector frame, and every
    * estimator is the same integer-exact rational as
    * [[hllEstimateFromRegisters]] (never-hit registers contribute
    * their 2⁶² term inside the in-row `aggregate` fold) — so the
    * whole pair frame sits under the DuckDB hash gate (q194).
    * C(|groups|, 2) pairs of 100 TB key sets become C(|groups|, 2)
    * pairs of 256-byte-ish register vectors. */
  def hllPairAlgebra(regs: DataFrame, groupCol: String,
                     b: Int = 8): DataFrame = {
    require(b >= 7 && b <= 15,
      s"b must be in [7,15] (m >= 128 for the closed-form alpha), got $b")
    val m = 1L << b
    val numc = hllAlphaNum(b) * BigInt(2).pow(62)
    val den = hllAlphaDen(b)
    val dense = regs.groupBy(groupCol)
      .agg(map_from_entries(collect_list(struct(col("j"), col("mr"))))
        .as("rm"))
      .select(col(groupCol),
        expr(s"transform(sequence(0, ${m - 1}), " +
          "j -> coalesce(rm[cast(j as bigint)], 0))").as("regs"))
    def est(arr: String) =
      s"cast(cast($numc as decimal(38,0)) div ($den * aggregate($arr, " +
        "cast(0 as decimal(38,0)), (acc, r) -> acc + " +
        "cast(shiftleft(cast(1 as bigint), cast(62 - r as int))" +
        " as decimal(38,0)))) as bigint)"
    val a = dense.select(col(groupCol).as("t1"), col("regs").as("r1"))
    val bside = dense.select(col(groupCol).as("t2"), col("regs").as("r2"))
    a.join(broadcast(bside), col("t1") < col("t2"))
      .withColumn("ru", expr("zip_with(r1, r2, (x, y) -> greatest(x, y))"))
      .withColumn("est_t1", expr(est("r1")))
      .withColumn("est_t2", expr(est("r2")))
      .withColumn("est_union", expr(est("ru")))
      .withColumn("est_inter",
        greatest(col("est_t1") + col("est_t2") - col("est_union"), lit(0L)))
      // the union sketch's regime telemetry (r18): never-hit register
      // count of the MERGED vector — the q191 v_zero stance at the
      // pair level, and [[adaptivePairAlgebra]]'s route signal
      .withColumn("v_zero_union",
        expr("aggregate(ru, 0L, (acc, r) -> acc + if(r = 0, 1L, 0L))"))
      .select(col("t1"), col("t2"), col("est_t1"), col("est_t2"),
        col("est_union"), col("est_inter"), col("v_zero_union"),
        expr("cast(cast(est_inter as decimal(38,0)) * 1000 " +
          "div greatest(est_union, 1) as bigint)")
          .as("jaccard_est_permille"))
  }

  /** Production sizing dial for [[bloomBits]] — `mBits` from the
    * expected distinct-key count `n`, the hash count `kHash`, and a
    * target false-positive rate (permille), via the classic Bloom
    * curve `p = (1 − e^(−k·n/m))^k` solved for m
    * (`m = ⌈−k·n / ln(1 − p^(1/k))⌉`), rounded UP to the next power
    * of two — so the achieved rate is at or below target, `pos %
    * mBits` stays uniform, and two filters sized for the same n can
    * OR-merge — floored at `minBits` and capped at 2³⁰ (128 MiB of
    * words; past that, shard the key space across several filters
    * and probe the shard — one bitmap is the wrong shape). The
    * [[graft.operators.Similarity.srpBitsFor]] /
    * [[graft.sources.WebArchive.fanoutFor]] convention: the dial that
    * was documented prose becomes a helper with the deployed
    * operating points as its spec (Round18Spec).
    *
    * q193's fixture dial is this curve's output: the sf0.1-scale eval
    * set (~10k distinct shingles) at k=3 and a 10‰ target gives
    * 2¹⁷ = 131072 — whose achieved rate at that load is the ~0.9%
    * the q193 scaladoc documents. The QUERY keeps mBits fixed because
    * its DuckDB oracle replays the literal bitmap; production sizes
    * per corpus with this helper. */
  def bloomBitsFor(n: Long, kHash: Int = 3, targetFprPermille: Int = 10,
                   minBits: Int = 4096): Int = {
    require(n >= 0 && kHash >= 1 && kHash <= 4 &&
      targetFprPermille >= 1 && targetFprPermille <= 999 &&
      minBits >= 64 && Integer.bitCount(minBits) == 1 && minBits <= (1 << 30),
      s"need n >= 0, kHash in [1,4], target in [1,999] permille, minBits a " +
        s"power of two in [64, 2^30]: $n/$kHash/$targetFprPermille/$minBits")
    if (n == 0L) minBits
    else {
      val p = targetFprPermille / 1000.0
      val mReal = -kHash.toDouble * n / math.log1p(-math.pow(p, 1.0 / kHash))
      val b = math.ceil(math.log(mReal) / math.log(2.0)).toInt
      math.max(minBits, 1 << math.min(30, math.max(6, b)))
    }
  }

  /** Bloom-filter BITMAP over `keyCol` as ≤ `mBits/64` BIGINT words:
    * `kHash` md5-slice positions per key (the [[withCmBuckets]]
    * single-digest convention at 8 hex chars — 32 bits, so mBits can
    * exceed the CM sketch's 16-bit bucket space), OR-folded per word. Like
    * the CM counters the state is a bounded group-by (`bit_or` is a
    * combinable aggregate: map-side partials OR together), so the
    * build is one pass over the key set with ≤ mBits/64 rows of
    * shuffle, two filters' bitmaps (or two micro-batches' partials)
    * merge by the same OR, and duplicate keys are free (OR is
    * idempotent — no distinct pass). Membership semantics are the
    * Bloom theorem's: NO false negatives ever (every inserted key's
    * bits are set), false positives at the classic
    * `(1 − e^(−kn/m))^k` rate — the q193 dial (k=3, m=2¹⁷) prices the
    * sf0.1 fixture at ~0.9 %. All arithmetic integer (positions,
    * words, bit masks), so bitmap AND probe replay under the DuckDB
    * hash gate.
    *
    * Relation to q144: [[graft.ops.Relational.q144BloomPrune]] inlines
    * this same construction for JOIN pruning (k=2, 60-bit words,
    * 16-bit position space — sized for integer dim keys). This is the
    * reusable operator form at crawl-text dials: 32-bit position
    * space (8 hex chars) so mBits can reach 2¹⁷+, and FULL 64-bit
    * words — bit 63 is usable because the oracle replays its mask
    * with the q134 minlong CASE trick where a literal `1 << 63` would
    * overflow DuckDB's signed shift (Spark's `shiftleft` is a bit op,
    * no ANSI check; the cross-engine equality is pinned by q193's
    * gate and the prototype replay). */
  def bloomBits(df: DataFrame, keyCol: String, tag: String = "bf",
                kHash: Int = 3, mBits: Int = 131072): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(kHash >= 1 && kHash <= 4,
      s"kHash must be in [1,4] (4 disjoint 8-hex slices per md5 digest), got $kHash")
    df.withColumn("_hx", expr(s"md5(cast($keyCol as string) || ':$tag')"))
      .select(posexplode(array((0 until kHash).map { r =>
        expr(s"(${Md5Key.hexToLongSparkAt("_hx", 1 + 8 * r, 8)}) % $mBits")
      }: _*)).as(Seq("r", "pos")))
      .select(expr("pos div 64").as("word"), expr("pos % 64").as("bit"))
      .groupBy("word")
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(bit as int)))")
        .as("bits"))
  }

  /** Bloom membership probe: `carry` columns + a `maybe` boolean per
    * input row. The probe is SHUFFLE-FREE by construction: the
    * `kHash` positions are computed as COLUMNS (no explode), each
    * looked up through its own broadcast hash join against the tiny
    * bitmap frame, and `maybe` is the AND of the hits — so probing a
    * 100 TB corpus against a benchmark filter is one map-side pass,
    * the decontamination pre-filter shape (the exact
    * [[Dedup.contamination]] overlap join then runs only on the
    * survivors the filter couldn't clear). Missing words (bitmap rows
    * are materialized only for set words) read as all-zero via the
    * left join's NULL → false. */
  def bloomMaybe(df: DataFrame, keyCol: String, bits: DataFrame,
                 carry: Seq[String], tag: String = "bf",
                 kHash: Int = 3, mBits: Int = 131072): DataFrame = {
    require(kHash >= 1 && kHash <= 4,
      s"kHash must be in [1,4] (4 disjoint 8-hex slices per md5 digest), got $kHash")
    val withPos = (0 until kHash).foldLeft(
      df.withColumn("_hx", expr(s"md5(cast($keyCol as string) || ':$tag')"))) {
      (acc, r) =>
        acc.withColumn(s"_p$r",
          expr(s"(${Md5Key.hexToLongSparkAt("_hx", 1 + 8 * r, 8)}) % $mBits"))
    }
    val joined = (0 until kHash).foldLeft(withPos) { (acc, r) =>
      acc.join(broadcast(bits.select(col("word").as(s"_w$r"),
          col("bits").as(s"_b$r"))),
          expr(s"_p$r div 64 = _w$r"), "left")
        .withColumn(s"_hit$r", coalesce(
          expr(s"(_b$r & shiftleft(cast(1 as bigint), cast(_p$r % 64 as int))) != 0"),
          lit(false)))
    }
    joined.select(carry.map(col) :+
      (0 until kHash).map(r => col(s"_hit$r")).reduce(_ && _).as("maybe"): _*)
  }
}
