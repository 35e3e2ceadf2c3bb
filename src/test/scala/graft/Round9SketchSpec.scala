package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventQueries

/** Contracts for the Misra–Gries native aggregate and the KMV pair
  * algebra (q160/q161/q162): MG's worst-case guarantees hold under
  * adversarial skew on EVERY partitioning (the mergeable-summaries
  * theorem exercised through Spark's real partial/merge tree), its
  * deterministic regime is the exact frequency table, and the KMV
  * set-algebra estimates degrade to exact set algebra below k and
  * stay inside the Beyer-et-al error envelope against the exact
  * overlap query above it.
  */
class Round9SketchSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------- Misra–Gries

  /** (value, count) rows → one MG summary, under a chosen partition
    * count so the partial/merge tree actually varies between cases. */
  private def mgSummary(values: Seq[Long], k: Int, parts: Int): Seq[(Long, Long)] = {
    graft.functions.MisraGries.register(spark)
    values.toDF("v").repartition(parts)
      .agg(expr(s"misra_gries(v, $k)").as("mg"))
      .select(explode($"mg").as("e"))
      .select($"e.v", $"e.c").as[(Long, Long)].collect().toSeq
  }

  test("misra_gries deterministic regime: distinct <= k is the exact frequency table") {
    // 5 distinct values, k = 8: no decrement can ever fire, on any
    // partitioning — identical exact output across partition counts
    val data = Seq.tabulate(1000)(i => (i % 5).toLong * 7) // values 0,7,14,21,28
    val exact = data.groupBy(identity).map { case (v, vs) => (v, vs.size.toLong) }
      .toSeq.sortBy { case (v, c) => (-c, v) }
    for (parts <- Seq(1, 7, 32)) {
      val got = mgSummary(data, k = 8, parts = parts)
      assert(got == exact, s"parts=$parts")
    }
  }

  test("misra_gries guarantees hold under adversarial skew on every partitioning") {
    // two dominant values over a 200-value long tail: f(0) = 30000 and
    // f(1) = 15000 both clear the n/(k+1) support line at k = 4
    // (n = 63 000, threshold 12 600); the tail forces constant decrement
    // pressure so the guarantees are exercised, not vacuous
    val data: Seq[Long] = Seq.fill(30000)(0L) ++ Seq.fill(15000)(1L) ++
      Seq.fill(8000)(2L) ++ (0 until 200).flatMap(v => Seq.fill(50)(v + 10L))
    val n = data.size.toLong
    val k = 4
    val exact: Map[Long, Long] =
      data.groupBy(identity).map { case (v, vs) => (v, vs.size.toLong) }
    val heavy = exact.filter { case (_, f) => f * (k + 1) > n }.keySet
    assert(heavy.nonEmpty, "fixture must have true heavy hitters")
    for (parts <- Seq(1, 5, 32)) {
      val got = mgSummary(data, k = k, parts = parts)
      assert(got.size <= k, s"parts=$parts: summary exceeded k")
      val sumC = got.map(_._2).sum
      val bound = (n - sumC) / (k + 1)
      got.foreach { case (v, c) =>
        val f = exact.getOrElse(v, 0L)
        assert(c <= f, s"parts=$parts: overestimate v=$v c=$c f=$f")
        assert(f - c <= bound,
          s"parts=$parts: underestimate beyond bound v=$v c=$c f=$f bound=$bound")
      }
      val kept = got.map(_._1).toSet
      assert(heavy.subsetOf(kept),
        s"parts=$parts: heavy hitter missing: ${heavy -- kept}")
    }
  }

  test("misra_gries hot-key skew: one dominant value stays exact at any volume") {
    // the all-rows-one-key shape that melts unbounded aggregations:
    // 1M rows of value 42 plus a 3-value trickle. The dominant key
    // never loses weight to a decrement it can't afford (its counter
    // dwarfs the trickle), and with distinct = 4 <= k the summary is
    // exact — state one counter per distinct value, never per row.
    graft.functions.MisraGries.register(spark)
    val got = spark.range(1000000L).selectExpr("42L AS v")
      .union(spark.range(3).selectExpr("id AS v"))
      .repartition(32)
      .agg(expr("misra_gries(v, 8)").as("mg"))
      .select(explode($"mg").as("e")).select($"e.v", $"e.c")
      .as[(Long, Long)].collect().toMap
    assert(got(42L) == 1000000L)
    assert(got.size == 4)
  }

  test("misra_gries rejects bad k and non-bigint input at analysis time") {
    graft.functions.MisraGries.register(spark)
    val df = Seq(1L, 2L).toDF("v")
    intercept[Exception] { df.selectExpr("misra_gries(v, 0)").collect() }
    intercept[Exception] {
      df.selectExpr(s"misra_gries(v, ${graft.functions.MisraGries.MaxK + 1})").collect()
    }
    intercept[Exception] {
      Seq("a").toDF("s").selectExpr("misra_gries(s, 4)").collect()
    }
  }

  // ------------------------------------------------------ KMV pair algebra

  /** Two groups with a controlled id overlap. */
  private def overlapDf(nA: Int, nB: Int, shared: Int) = {
    val a = (0 until nA).map(i => ("a", i.toLong))
    val b = (0 until nB).map(i => ("b", (nA - shared + i).toLong))
    (a ++ b).toDF("g", "id")
  }

  test("kmv pair algebra is EXACT set algebra when the union fits below k") {
    // |A| = 30, |B| = 25, overlap 10 -> union 45 < k = 64: the heads
    // hold the full hash sets and every estimator degenerates to exact
    val df = overlapDf(30, 25, 10)
    val heads = graft.operators.Sketches.kmvHeads(df, "g", "id", k = 64)
    val row = graft.operators.Sketches.kmvPairAlgebra(heads, "g", k = 64)
      .collect().head
    assert(row.getAs[Long]("n_union_heads") == 45L)
    assert(row.getAs[Long]("est_union") == 45L)
    assert(row.getAs[Long]("n_inter_heads") == 10L)
    assert(row.getAs[Long]("est_inter") == 10L)
    assert(row.getAs[Long]("jaccard_est_permille") == 10L * 1000 / 45)
  }

  test("kmv pair algebra estimates stay inside the error envelope above k") {
    // |A| = |B| = 1000, overlap 500 -> union 1500, jaccard 1/3.
    // k = 64: KMV relative error ~ 1/sqrt(k-2) ~ 13%; assert a loose
    // 3-sigma envelope so the test pins correctness, not luck.
    val df = overlapDf(1000, 1000, 500)
    val heads = graft.operators.Sketches.kmvHeads(df, "g", "id", k = 64)
    val row = graft.operators.Sketches.kmvPairAlgebra(heads, "g", k = 64)
      .collect().head
    val estU = row.getAs[Long]("est_union")
    assert(math.abs(estU - 1500L) < 1500 * 0.4, s"est_union=$estU")
    val estJ = row.getAs[Long]("jaccard_est_permille")
    assert(math.abs(estJ - 333L) < 220, s"jaccard_est_permille=$estJ")
    val estI = row.getAs[Long]("est_inter")
    assert(estI > 150 && estI < 1000, s"est_inter=$estI")
  }

  test("q160 sketch overlap tracks q155 exact overlap on the fixture") {
    val exact = EventQueries.q155AudienceOverlap(spark, dir)
      .select($"t1", $"t2", $"jaccard_permille").as[(String, String, Long)]
      .collect().map { case (a, b, j) => ((a, b), j) }.toMap
    val est = EventQueries.q160KmvOverlap(spark, dir)
      .select($"t1", $"t2", $"jaccard_est_permille").as[(String, String, Long)]
      .collect().map { case (a, b, j) => ((a, b), j) }.toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (pair, j) =>
      assert(math.abs(j - exact(pair)) <= 250,
        s"$pair: est=$j exact=${exact(pair)}")
    }
  }

  test("streaming misra_gries: continuously-maintained summary keeps the guarantees") {
    // the MG buffer is mergeable state, so the same declarative
    // aggregate runs as a Complete-mode streaming view (the KMV /
    // count-min pattern): O(k) state per group FOREVER. Deterministic
    // regime -> final state equals batch exactly; a value re-arriving
    // in a later micro-batch must increment, not re-insert.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.MisraGries.register(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(5)(3L)
    val b2 = Seq.fill(10)(1L) ++ Seq.fill(30)(4L) ++ Seq.fill(5)(3L)
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("v")
      .agg(expr("misra_gries(v, 8)").as("mg"))
      .select(explode($"mg").as("e")).select($"e.v", $"e.c")
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("mg_stream").as[(Long, Long)].collect().toSeq
      val batch = mgSummary(b1 ++ b2, k = 8, parts = 4)
      assert(streamed.sortBy(_._1) == batch.sortBy(_._1))
      assert(streamed.toMap == Map(1L -> 50L, 2L -> 25L, 3L -> 10L, 4L -> 30L))
    } finally q.stop()
  }

  // -------------------------------------------------- compression ratio

  test("deflate_len: global redundancy compresses, entropy does not; null-safe") {
    graft.functions.DeflateLen.register(spark)
    val para = "the quick brown fox jumps over the lazy dog and keeps going "
    val rows = Seq(
      ("pasted", para * 20),                       // global redundancy
      ("prose", (1 to 20).map(i =>
        s"sentence $i mixes fresh tokens like alpha$i beta$i").mkString(" ")),
      ("entropy", (1 to 300).map(i =>
        ((i * 2654435761L) % 1296).toHexString).mkString(""))
    ).toDF("kind", "text")
      .selectExpr("kind", "octet_length(text) AS raw", "deflate_len(text) AS d")
      .collect().map(r => r.getString(0) -> (r.getInt(1).toLong, r.getLong(2))).toMap
    def permille(t: (Long, Long)) = t._2 * 1000 / t._1
    assert(permille(rows("pasted")) < 100,
      s"20x-pasted paragraph must compress away, got ${permille(rows("pasted"))}")
    assert(permille(rows("prose")) > permille(rows("pasted")))
    assert(permille(rows("entropy")) > permille(rows("prose")),
      "hex soup must compress worse than prose")
    val n = Seq(Option.empty[String]).toDF("text")
      .selectExpr("deflate_len(text) AS d").collect()(0)
    assert(n.isNullAt(0), "null stays null")
    // an all-empty corpus must yield ratio EXACTLY 0 through q167's
    // explicit sum_raw = 0 branch — not an ANSI divide-by-zero, and
    // not 2000·n_docs (DEFLATE of "" is 2 bytes, so sum_deflated = 4
    // here while sum_raw = 0; plain or greatest-guarded division both
    // get this wrong)
    val row = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
      .selectExpr("octet_length(text) AS raw", "deflate_len(text) AS d")
      .selectExpr("sum(d) AS sum_deflated", "sum(raw) AS sum_raw")
      .selectExpr("sum_deflated", "CASE WHEN sum_raw = 0 THEN 0L " +
        "ELSE sum_deflated * 1000 div sum_raw END AS p").collect()(0)
    assert(row.getLong(0) == 4L, "DEFLATE of '' must be 2 bytes per doc")
    assert(row.getLong(1) == 0L, "all-empty group must degrade to ratio 0")
  }

  test("q167 pin equals the live computation (zlib/fixture drift guard)") {
    val dir001 = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir001/documents.parquet").exists())
    // the oracle constants for q167 are a pinned frame; recompute live
    // and compare value-for-value so a JVM/zlib change or fixture
    // regen fails HERE with re-pin instructions before the driver gate
    val live = graft.ops.TextQueries.q167CompressionRatio(spark, dir001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val pinned = Seq(
      ("de", 70L, 19525L, 9548L, 489L),
      ("en", 218L, 64437L, 30901L, 479L),
      ("es", 73L, 21756L, 10416L, 478L),
      ("fr", 64L, 20623L, 9610L, 465L),
      ("zh", 75L, 22833L, 10874L, 476L))
    assert(live == pinned,
      s"q167 live != pin — fixture or zlib changed; re-pin the oracle VALUES " +
        s"from the live rows: $live")
  }

  test("q162 certificate is all-clear on the fixture (theorem columns hold)") {
    val rows = EventQueries.q162MgCertificate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_over_est") == 0L)
      assert(r.getAs[Long]("n_bound_viol") == 0L)
      assert(r.getAs[Long]("n_heavy_found") == r.getAs[Long]("n_heavy_true"))
    }
  }
}
