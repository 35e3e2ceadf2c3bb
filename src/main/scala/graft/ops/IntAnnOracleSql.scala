package graft.ops

/** DuckDB replay SQL for the integer-exact ANN family
  * ([[graft.operators.SimilarityInt]]) — the r20 graduation of
  * q171/q174/q43 from rows-only checks to FULL hash oracles, plus
  * the derived (no longer pinned) recall rows q172/q175/q58.
  *
  * Construction mirrors the Spark plans step for step:
  *   - `zb`/`zp`/`zf`: the integer-normalized coding (bit-exact
  *     cross-engine: fixed-order per-row double chain, verified
  *     coordinate-for-coordinate on the fixture) in array,
  *     per-(sub, pos) and full-dim relational forms;
  *   - seeded draws: `ORDER BY md5(vid || ':seed'), vid LIMIT n` —
  *     lexicographic hex order, both engines identical;
  *   - k-means: unrolled assign/mean CTE pairs; assignment is
  *     `row_number() OVER (... ORDER BY d2, cid) = 1` (Spark's
  *     max_by struct tiebreak), means are sign-split truncating
  *     division (Spark `div` == the `CASE`-wrapped `//`);
  *   - ADC/shortlist/rerank: integer sums, (adist, neighbor) and
  *     (dot DESC, neighbor) row_numbers.
  *
  * All intermediate sums ride DuckDB HUGEINT (exact); only the
  * final SELECT casts to the BIGINT/DOUBLE types Spark emits. */
object IntAnnOracleSql {

  /** The z coding: array form `zb(vid, z)`, PQ subvector rows
    * `zp(vid, sub, pos, v)` (dsub = len/m positions per sub), and
    * full-dim rows `zf(vid, pos, v)`. */
  private def zCtes(m: Int): String =
    s"""zb AS (SELECT vec_id AS vid,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / greatest(sqrt(list_reduce(list_transform(embedding, v -> CAST(v AS DOUBLE) * v), (a,b) -> a + b)), 1e-30) * 10000.0) AS BIGINT)) AS z
       |  FROM embeddings),
       |zp AS MATERIALIZED (
       |  SELECT vid, i // (len(z) // $m) AS sub, i % (len(z) // $m) AS pos, z[i+1] AS v
       |  FROM zb, UNNEST(range(len(z))) t(i)),
       |zf AS MATERIALIZED (
       |  SELECT vid, i AS pos, z[i+1] AS v
       |  FROM zb, UNNEST(range(len(z))) t(i))""".stripMargin

  /** One assign+mean k-means step: `{p}a{i}` assigns `{p}tz` rows to
    * `{from}` centroids (argmin d2, cid tiebreak), `{p}c{i}` is the
    * sign-split truncated mean per (sub, cid, pos). */
  private def lloydStep(p: String, i: Int, from: String): String =
    s"""${p}a$i AS (SELECT vid, sub, cid FROM (
       |    SELECT t.vid, t.sub, c.cid,
       |      row_number() OVER (PARTITION BY t.vid, t.sub
       |        ORDER BY sum((t.v - c.mu)*(t.v - c.mu)), c.cid) AS rn
       |    FROM ${p}tz t JOIN $from c ON t.sub = c.sub AND t.pos = c.pos
       |    GROUP BY t.vid, t.sub, c.cid) x WHERE rn = 1),
       |${p}c$i AS MATERIALIZED (
       |  SELECT sub, cid, pos,
       |    CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS mu
       |  FROM (SELECT a.sub, a.cid, t.pos, sum(t.v) AS s, count(*) AS n
       |        FROM ${p}a$i a JOIN ${p}tz t ON a.vid = t.vid AND a.sub = t.sub
       |        GROUP BY a.sub, a.cid, t.pos))""".stripMargin

  /** The full unrolled integer k-means over subvector rows `src`
    * (vid, sub, pos, v): md5(:seedA) seeds, md5(:seedB) 256·k
    * training sample, `iters` steps; the final centroids are
    * `{p}c{iters}(sub, cid, pos, mu)`. */
  private def kmeans(p: String, src: String, k: Int, seedA: Long,
                     seedB: Long, iters: Int): String = {
    val seeds =
      s"""${p}sd AS (SELECT vid AS cid FROM zb
         |  ORDER BY md5(CAST(vid AS VARCHAR) || ':$seedA'), vid LIMIT $k),
         |${p}c0 AS (SELECT s.sub, s.vid AS cid, s.pos, s.v AS mu
         |  FROM $src s JOIN ${p}sd ON s.vid = ${p}sd.cid),
         |${p}tr AS (SELECT vid FROM zb
         |  ORDER BY md5(CAST(vid AS VARCHAR) || ':$seedB'), vid LIMIT ${256 * k}),
         |${p}tz AS MATERIALIZED (SELECT s.* FROM $src s JOIN ${p}tr USING (vid))""".stripMargin
    val steps = (1 to iters).map(i => lloydStep(p, i, s"${p}c${i - 1}"))
    (seeds +: steps).mkString(",\n")
  }

  /** Nearest-centroid code per (vid, sub) of `src` rows against
    * `cents` — the encode / corpus-assignment shape. */
  private def encode(name: String, src: String, cents: String,
                     out: String = "code"): String =
    s"""$name AS MATERIALIZED (SELECT vid, sub, cid AS $out FROM (
       |    SELECT s.vid, s.sub, c.cid,
       |      row_number() OVER (PARTITION BY s.vid, s.sub
       |        ORDER BY sum((s.v - c.mu)*(s.v - c.mu)), c.cid) AS rn
       |    FROM $src s JOIN $cents c ON s.sub = c.sub AND s.pos = c.pos
       |    GROUP BY s.vid, s.sub, c.cid) x WHERE rn = 1)""".stripMargin

  /** Exact z-dot rerank of `cand(query_id, neighbor_id)` → the
    * (query_id, neighbor_id, rank ≤ k) final SELECT. */
  private def rerank(cand: String, k: Int): String =
    s"""dots AS (SELECT c.query_id, c.neighbor_id, sum(a.v * b.v) AS dot
       |  FROM $cand c
       |  JOIN zf a ON a.vid = c.query_id
       |  JOIN zf b ON b.vid = c.neighbor_id AND b.pos = a.pos
       |  GROUP BY c.query_id, c.neighbor_id)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM dots) x WHERE rank <= $k""".stripMargin

  /** q171: integer PQ/ADC — one k-means over zp, encode, per-query
    * LUT, adist shortlist, z-dot rerank. */
  def q171Sql(m: Int = 8, ksub: Int = 16, iters: Int = 2,
              seed: Long = 42L, rerankN: Int = 50, k: Int = 10): String =
    s"""WITH ${zCtes(m)},
       |${kmeans("p", "zp", ksub, seed, seed + 1, iters)},
       |${encode("enc", "zp", s"pc$iters")},
       |lut AS (SELECT q.vid AS query_id, c.sub, c.cid AS code,
       |          sum((q.v - c.mu)*(q.v - c.mu)) AS d2
       |        FROM zp q JOIN pc$iters c ON q.sub = c.sub AND q.pos = c.pos
       |        WHERE q.vid < 10
       |        GROUP BY q.vid, c.sub, c.cid),
       |ad AS (SELECT l.query_id, e.vid AS neighbor_id, sum(l.d2) AS adist
       |       FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
       |       WHERE e.vid <> l.query_id
       |       GROUP BY l.query_id, e.vid),
       |sl AS (SELECT query_id, neighbor_id FROM (
       |        SELECT query_id, neighbor_id,
       |          row_number() OVER (PARTITION BY query_id
       |                             ORDER BY adist, neighbor_id) AS ar
       |        FROM ad) x WHERE ar <= $rerankN),
       |${rerank("sl", k)}""".stripMargin

  /** The coarse-IVF prologue shared by q43 and q174: full-dim
    * k-means (m=1 via constant sub), corpus assignment `asg(vid,
    * list_id)`, query probes `pr(query_id, list_id)` (nprobe
    * d2-nearest lists). */
  private def coarse(nlist: Int, iters: Int, seed: Long,
                     nprobe: Int): String = {
    val zc = "(SELECT vid, 0 AS sub, pos, v FROM zf)"
    s"""${kmeans("g", zc, nlist, seed, seed + 1, iters)},
       |${encode("asg", zc, s"gc$iters", "list_id")},
       |pr AS (SELECT vid AS query_id, cid AS list_id FROM (
       |    SELECT s.vid, c.cid,
       |      row_number() OVER (PARTITION BY s.vid
       |        ORDER BY sum((s.v - c.mu)*(s.v - c.mu)), c.cid) AS rn
       |    FROM zf s JOIN gc$iters c ON s.pos = c.pos
       |    WHERE s.vid < 10
       |    GROUP BY s.vid, c.cid) x WHERE rn <= $nprobe)""".stripMargin
  }

  /** q43: integer IVF-flat — coarse route, probed-list members as
    * candidates, z-dot rerank. */
  def q43Sql(nlist: Int = 128, iters: Int = 2, seed: Long = 42L,
             nprobe: Int = 16, k: Int = 10): String =
    s"""WITH ${zCtes(8)},
       |${coarse(nlist, iters, seed, nprobe)},
       |cand AS (SELECT pr.query_id, asg.vid AS neighbor_id
       |         FROM asg JOIN pr USING (list_id)
       |         WHERE asg.vid <> pr.query_id),
       |${rerank("cand", k)}""".stripMargin

  /** q174: integer IVFADC — coarse route, residual PQ codebooks,
    * per-(query, probed list) residual LUT, adist shortlist, z-dot
    * rerank. PQ seed streams are seed+2/seed+3 (disjoint from the
    * coarse draw), matching [[graft.operators.SimilarityInt
    * .ivfPqBuildInt]]. */
  def q174Sql(nlist: Int = 64, m: Int = 8, ksub: Int = 16,
              iters: Int = 2, seed: Long = 42L, nprobe: Int = 16,
              rerankN: Int = 50, k: Int = 10): String =
    s"""WITH ${zCtes(m)},
       |${coarse(nlist, iters, seed, nprobe)},
       |rp AS MATERIALIZED (
       |  SELECT zf.vid, asg.list_id,
       |    zf.pos // ((SELECT max(pos)+1 FROM zf) // $m) AS sub,
       |    zf.pos % ((SELECT max(pos)+1 FROM zf) // $m) AS pos,
       |    zf.v - c.mu AS v
       |  FROM zf JOIN asg ON zf.vid = asg.vid
       |       JOIN gc$iters c ON c.cid = asg.list_id AND c.pos = zf.pos),
       |${kmeans("q", "(SELECT vid, sub, pos, v FROM rp)", ksub,
                 seed + 2, seed + 3, iters)},
       |codes AS MATERIALIZED (SELECT vid, list_id, sub, cid AS code FROM (
       |    SELECT s.vid, s.list_id, s.sub, c.cid,
       |      row_number() OVER (PARTITION BY s.vid, s.sub
       |        ORDER BY sum((s.v - c.mu)*(s.v - c.mu)), c.cid) AS rn
       |    FROM rp s JOIN qc$iters c ON s.sub = c.sub AND s.pos = c.pos
       |    GROUP BY s.vid, s.list_id, s.sub, c.cid) x WHERE rn = 1),
       |qr AS (SELECT pr.query_id, pr.list_id,
       |         zf.pos // ((SELECT max(pos)+1 FROM zf) // $m) AS sub,
       |         zf.pos % ((SELECT max(pos)+1 FROM zf) // $m) AS pos,
       |         zf.v - c.mu AS v
       |       FROM pr JOIN zf ON zf.vid = pr.query_id
       |            JOIN gc$iters c ON c.cid = pr.list_id AND c.pos = zf.pos),
       |lut AS (SELECT q.query_id, q.list_id, c.sub, c.cid AS code,
       |          sum((q.v - c.mu)*(q.v - c.mu)) AS d2
       |        FROM qr q JOIN qc$iters c ON q.sub = c.sub AND q.pos = c.pos
       |        GROUP BY q.query_id, q.list_id, c.sub, c.cid),
       |ad AS (SELECT l.query_id, e.vid AS neighbor_id, sum(l.d2) AS adist
       |       FROM codes e
       |       JOIN lut l ON e.list_id = l.list_id AND e.sub = l.sub
       |                  AND e.code = l.code
       |       WHERE e.vid <> l.query_id
       |       GROUP BY l.query_id, e.vid),
       |sl AS (SELECT query_id, neighbor_id FROM (
       |        SELECT query_id, neighbor_id,
       |          row_number() OVER (PARTITION BY query_id
       |                             ORDER BY adist, neighbor_id) AS ar
       |        FROM ad) x WHERE ar <= $rerankN),
       |${rerank("sl", k)}""".stripMargin

  /** One sign-band bucket: the sign pattern of raw float dims
    * [b·bits, (b+1)·bits) as a BIGINT — float sign compares exactly,
    * so bucketing replays (the q81 semanticDedup machinery, here in
    * query-vs-corpus form). */
  private def signBand(b: Int, bits: Int): String =
    (0 until bits).map(i =>
      s"(CASE WHEN embedding[${b * bits + i + 1}] >= 0 THEN ${1L << (bits - 1 - i)} ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")

  /** q210: sign-band LSH ANN top-k — candidates meet only inside an
    * equal (band, bucket) cell (query side vs corpus side), then the
    * exact integer z-dot rerank. The LSH-ANN class's fully-replayable
    * member (SRP q41 stays rows-only: its Gaussian hyperplanes are
    * engine-internal by construction). */
  def q210Sql(bands: Int = 8, bits: Int = 6, k: Int = 10): String = {
    val bandCols = (0 until bands)
      .map(b => s"${signBand(b, bits)} AS b$b").mkString(",\n  ")
    val bandUnion = (0 until bands)
      .map(b => s"SELECT vid, $b AS band, b$b AS bkt FROM u")
      .mkString("\n       UNION ALL ")
    s"""WITH ${zCtes(8)},
       |u AS (SELECT vec_id AS vid,
       |  $bandCols
       |  FROM embeddings),
       |bb AS ($bandUnion),
       |cand AS (SELECT DISTINCT q.vid AS query_id, c.vid AS neighbor_id
       |         FROM bb q JOIN bb c ON q.band = c.band AND q.bkt = c.bkt
       |         WHERE q.vid < 10 AND c.vid <> q.vid),
       |${rerank("cand", k)}""".stripMargin
  }

  /** Wrap an ANN replay and the exact-cosine replay into the
    * [[Agreement.summarize]] row — the derived recall oracle. */
  def agreementSql(annSql: String): String = {
    // q40's replay as a CTE body (strip the WITH, keep the chain)
    val exact =
      """SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (
        |      PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |               c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 10) t
        |WHERE rank <= 10""".stripMargin
    s"""WITH approx AS ($annSql),
       |exact AS ($exact),
       |n AS (SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
       |  (SELECT CAST(count(*) AS BIGINT) FROM approx) AS n_approx,
       |  (SELECT CAST(count(*) AS BIGINT) FROM approx a
       |     JOIN exact e ON a.query_id = e.query_id
       |                 AND a.neighbor_id = e.neighbor_id) AS n_hits)
       |SELECT n_exact, n_approx, n_hits,
       |  CASE WHEN n_exact > 0
       |       THEN CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE)
       |       ELSE 0.0 END AS recall
       |FROM n""".stripMargin
  }
}
