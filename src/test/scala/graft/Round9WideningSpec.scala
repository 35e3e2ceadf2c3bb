package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventQueries, Md5Key}

/** Round-9 widening: the KMV distinct-cardinality sketch
  * ([[graft.functions.BoundedMinKDistinct]] + q141) — set semantics
  * under duplication, layout invariance (the sketch is a pure function
  * of the value SET), the exact below-k path, and estimator accuracy
  * on a known cardinality. */
class Round9WideningSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("bounded_min_k_distinct: duplicates occupy one slot") {
    graft.functions.BoundedMinKDistinct.register(spark)
    // multiset min-k (bounded_min_k) would return [1,1,1,...]; the
    // distinct variant must surface the singletons past the hot values
    val rows = (Seq.fill(1000)(1L) ++ Seq.fill(1000)(2L) ++ (10L to 20L))
      .toDF("v")
    val got = rows.agg(expr("bounded_min_k_distinct(v, 8)").as("m"))
      .select("m").as[Seq[Long]].head()
    assert(got == Seq(1L, 2L, 10L, 11L, 12L, 13L, 14L, 15L))
  }

  test("bounded_min_k_distinct ≡ distinct-sort-take-k, layout-invariant") {
    graft.functions.BoundedMinKDistinct.register(spark)
    // multiplicative-hash values with collisions (mod a prime), keyed
    // into 3 groups; expected = per-group distinct, sorted, first 16
    val vs = (1 to 5000)
      .map(i => (i % 3, (i.toLong * 2654435761L) % 10007L))
      .toDF("g", "v")
    val expected = vs.distinct()
      .withColumn("rn", expr(
        "row_number() over (partition by g order by v)"))
      .filter($"rn" <= 16)
      .groupBy("g").agg(sort_array(collect_list($"v")).as("m"))
    def runOn(parts: Int) = vs.repartition(parts)
      .groupBy("g").agg(expr("bounded_min_k_distinct(v, 16)").as("m"))
    val one = runOn(1).collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val many = runOn(13).collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val exp = expected.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(one == exp)
    assert(many == exp)
  }

  test("q141 exact path: below-k groups report their true cardinality") {
    // sf0.001 has 15 distinct users per event type — every group is
    // below k=64, so the sketch holds ALL hashes: n_heads = exact
    // distinct count, kth_hash is NULL, est_distinct is exact
    val rows = EventQueries.q141KmvDistinct(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nHeads = r.getLong(r.fieldIndex("n_heads"))
      assert(r.isNullAt(r.fieldIndex("kth_hash")))
      assert(r.getLong(r.fieldIndex("est_distinct")) == nHeads)
      assert(nHeads == 15L)
    }
  }

  test("q142 stratified sample: balances strata, keeps the minority whole") {
    import graft.ops.TextQueries
    // synthesized skew: 400 'en' docs vs 50 'fr' docs. The rate brings
    // en's EXPECTED kept count to 50; md5 makes the draw deterministic,
    // so the band below is a pinned measurement, not a flaky tolerance.
    val docs = ((1 to 400).map(i => (i.toLong, s"t$i", "en", "s", 10L)) ++
      (1 to 50).map(i => (1000L + i, s"u$i", "fr", "s", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q142").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = TextQueries.q142StratifiedSample(spark, dir)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // minority stratum: rate = 4096 ≡ keep all 50
    assert(byLang("fr") == 50L)
    // majority stratum: expected 50 of 400; the fixed md5 draw lands
    // inside [30, 70] (±3σ of Binomial(400, 1/8))
    assert(byLang("en") >= 30L && byLang("en") <= 70L, s"en=${byLang("en")}")
    // pure function of (doc_id, seed): identical under any layout
    val again = TextQueries.q142StratifiedSample(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(again == kept.collect().map(_.toSeq).toSet)
  }

  test("q143 count-min: never underestimates, exact leg correct") {
    import graft.ops.EventQueries
    // planted counts: user 1 -> 300 events, user 2 -> 100, users
    // 10..209 -> 1 each; 64 buckets guarantee collisions in the tail
    val rows = (Seq.fill(300)(1L) ++ Seq.fill(100)(2L) ++ (10L to 209L))
      .zipWithIndex.map { case (u, i) =>
        (i.toLong, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i)),
          u, "view", 1.0, "{}")
      }
    val dir = java.nio.file.Files.createTempDirectory("q143").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.q143CountMin(spark, dir).collect()
    assert(out.length == 202)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("over_by")) >= 0L,
        s"underestimate for user ${r.getLong(0)}")
    }
    val byUser = out.map(r =>
      r.getLong(r.fieldIndex("user_id")) ->
        r.getLong(r.fieldIndex("n_exact"))).toMap
    assert(byUser(1L) == 300L && byUser(2L) == 100L && byUser(42L) == 1L)
  }

  test("q144 bloom: all-member and no-member builds behave exactly") {
    import graft.ops.Relational
    val dir = java.nio.file.Files.createTempDirectory("q144").toString
    def write(buildPrice: Double): Unit = {
      (1L to 40L).map(k => (k, buildPrice))
        .toDF("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      (1L to 40L).flatMap(k => Seq((k, 1L), (k, 2L)))
        .toDF("l_orderkey", "l_linenumber")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }
    // every order qualifies -> every fact row is a true member: the
    // filter must pass ALL of them (zero false negatives) and false
    // positives have no room to exist
    write(buildPrice = 500000.0)
    val all = Relational.q144BloomPrune(spark, dir).collect().head
    assert(all.getLong(all.fieldIndex("n_candidates")) == 80L)
    assert(all.getLong(all.fieldIndex("n_true")) == 80L)
    assert(all.getLong(all.fieldIndex("n_false_pos")) == 0L)
    // no order qualifies -> the filter is all-zero words: nothing
    // may pass (the absent-word coalesce(0) path)
    write(buildPrice = 1.0)
    val none = Relational.q144BloomPrune(spark, dir).collect().head
    assert(none.getLong(none.fieldIndex("n_build_keys")) == 0L)
    assert(none.getLong(none.fieldIndex("n_candidates")) == 0L)
    assert(none.getLong(none.fieldIndex("n_true")) == 0L)
  }

  test("q145 BPE pairs: closed-form adjacent-pair counts") {
    import graft.ops.TextQueries
    // "abab abc x" per doc: 'ab' appears 2(in abab)+1(in abc)=3 per
    // doc, 'ba' 1, 'bc' 1; 'x' is length-1 and contributes nothing
    val dir = java.nio.file.Files.createTempDirectory("q145").toString
    (1 to 4).map(i => (i.toLong, "abab abc x", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.q145BpePairs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 12L, "ba" -> 4L, "bc" -> 4L))
  }

  test("q146 hard negatives: picks the planted closest other-label vector") {
    import graft.ops.SimilarityQueries
    val dir = java.nio.file.Files.createTempDirectory("q146").toString
    // anchors (label 0) along +x; id 5 (label 1) is nearly identical
    // to anchor 0, id 6 (label 1) is its opposite — the hard negative
    // for every label-0 anchor must be 5, never 6
    val rows = Seq(
      (0L, Array(100f, 0f, 0f, 0f), 0),
      (1L, Array(90f, 10f, 0f, 0f), 0),
      (2L, Array(80f, 20f, 0f, 0f), 0),
      (5L, Array(99f, 1f, 0f, 0f), 1),
      (6L, Array(-100f, 0f, 0f, 0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.q146HardNegatives(spark, dir).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("a_label")) !=
        r.getLong(r.fieldIndex("neg_label")))
    }
    val negOf = out.map(r => r.getLong(r.fieldIndex("a_id")) ->
      r.getLong(r.fieldIndex("neg_id"))).toMap
    assert(negOf(0L) == 5L)
    assert(negOf(1L) == 5L)
    assert(negOf(2L) == 5L)
  }

  test("q147 join-size estimate: exact when collision-free, never under") {
    import graft.ops.Relational
    val dir = java.nio.file.Files.createTempDirectory("q147").toString
    // 10 order keys, 3 lineitem rows each; 5 keys pass the price cut
    // -> true join size 15. 15 distinct keys in w=16384 buckets land
    // collision-free (deterministic md5), so min over the 3 sketch
    // rows recovers the exact count.
    (1L to 10L).map(k => (k, if (k <= 5) 500000.0 else 1.0))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (1L to 10L).flatMap(k => (1L to 3L).map(l => (k, l)))
      .toDF("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.q147JoinSizeEst(spark, dir).collect().head
    assert(r.getLong(r.fieldIndex("n_exact")) == 15L)
    assert(r.getLong(r.fieldIndex("over_by")) >= 0L)
    assert(r.getLong(r.fieldIndex("est_join")) == 15L)
  }

  test("streaming KMV sketch: final state equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Sketches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch 2 re-sends ids from batch 1 (cross-micro-batch duplicates)
    // and adds new ones — the k-capped SET buffer in the state store
    // must dedup across batches, not just within one
    val b1 = (1L to 30L).map(i => ("a", i)) ++ (1L to 5L).map(i => ("b", i))
    val b2 = (20L to 50L).map(i => ("a", i)) ++ (1L to 5L).map(i => ("b", i))
    val ms = MemoryStream[(String, Long)]
    val q = Sketches.kmvDistinctEstimate(
        ms.toDF().toDF("g", "id"), "g", "id", k = 16)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("kmv_stream").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
      val batch = Sketches.kmvDistinctEstimate(
          (b1 ++ b2).toDF("g", "id"), "g", "id", k = 16).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
      assert(streamed == batch)
      // 'b' saw 5 distinct ids twice: below k -> exact 5, not 10
      assert(streamed("b") == ((5L, 5L)))
      // 'a' saw 50 distinct ids > k=16: the sketch is full
      assert(streamed("a")._1 == 16L)
    } finally q.stop()
  }

  test("bounded_min_k_pairs ≡ rank-take-k, layout-invariant") {
    graft.functions.BoundedMinKPairs.register(spark)
    val vs = (1 to 4000)
      .map(i => (i % 3, (i.toLong * 48271L) % 997L, i.toLong))
      .toDF("g", "ord", "tag")
    val expected = vs
      .withColumn("rn", expr(
        "row_number() over (partition by g order by ord, tag)"))
      .filter($"rn" <= 12)
      .groupBy("g").agg(expr(
        "sort_array(collect_list(struct(ord, tag)))").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Any](1)).toMap
    for (parts <- Seq(1, 13)) {
      val got = vs.repartition(parts)
        .groupBy("g").agg(expr("bounded_min_k_pairs(ord, tag, 12)").as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Any](1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("q148 priority sample: below-k exact, heavyweight always kept") {
    import graft.ops.TextQueries
    val dir = java.nio.file.Files.createTempDirectory("q148").toString
    // source 'small' has 5 docs (≤ k=8): everything kept, ŵ = w, the
    // estimate IS the exact total. source 'big' has 300 docs of
    // weight 10 plus one doc of weight 10^9 (~99.99% of the mass):
    // its priority ≈ hash/1e9 is pushed toward 0, so it MUST be
    // sampled, and the estimate must carry most of the mass.
    val rows =
      (1 to 5).map(i => (i.toLong, "t", "en", "small", 40L)) ++
      (100 to 399).map(i => (i.toLong, "t", "en", "big", 10L)) :+
      ((999L, "t", "en", "big", 1000000000L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.q148PrioritySample(spark, dir).collect()
    val small = out.filter(_.getString(0) == "small")
    assert(small.length == 5)
    small.foreach { r =>
      assert(r.getLong(r.fieldIndex("w_hat")) == r.getLong(r.fieldIndex("w")))
      assert(r.getLong(r.fieldIndex("est_total")) == 200L)
      assert(r.getLong(r.fieldIndex("exact_total")) == 200L)
    }
    val big = out.filter(_.getString(0) == "big")
    assert(big.length == 8)
    assert(big.exists(_.getLong(big.head.fieldIndex("doc_id")) == 999L),
      "the heavyweight doc must be in the sample")
    val est = big.head.getLong(big.head.fieldIndex("est_total"))
    val exact = big.head.getLong(big.head.fieldIndex("exact_total"))
    assert(est >= exact * 99 / 100,
      s"estimate $est lost the heavyweight mass (exact $exact)")
  }

  test("snapshotDiff: all branches, null-safe and position-safe prints") {
    import graft.operators.Maintenance
    val old = Seq(
      (1L, Option("a"), "x"),   // unchanged -> must NOT appear
      (2L, Option("b"), "y"),   // content changes
      (3L, Option.empty[String], "z"), // null -> "" must read as CHANGED
      (4L, Option("d"), "w"),   // removed
      (6L, Option("ab"), "c")   // boundary shift: ("ab","c")->("a","bc")
    ).toDF("id", "t", "u")
    val nw = Seq(
      (1L, Option("a"), "x"),
      (2L, Option("B"), "y"),
      (3L, Option(""), "z"),
      (5L, Option("e"), "v"),   // added
      (6L, Option("a"), "bc")
    ).toDF("id", "t", "u")
    val got = Maintenance.snapshotDiff(old, nw, "id", Seq("t", "u"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "changed", 4L -> "removed",
      5L -> "added", 6L -> "changed"))
  }

  test("q150 cross-lingual pairs: translated near-dups cross the lang gate") {
    import graft.ops.SimilarityQueries
    val dir = java.nio.file.Files.createTempDirectory("q150").toString
    // 64-dim corpus: doc 0 (en) and doc 1 (fr) share a near-identical
    // embedding (a "translation"); docs 2/3 are orthogonal noise; docs
    // 4/5 are near-identical but BOTH en — the lang gate must drop them
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (((seed * 31 + i * 7) % 13) - 6).toFloat)
    val base = vec(1)
    val rows = Seq(
      (0L, base, 0), (1L, base.map(_ + 0.01f), 1),
      (2L, vec(5), 0), (3L, vec(9), 1),
      (4L, vec(3), 0), (5L, vec(3).map(_ + 0.01f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq((0L, "t", "en", "s", 1L), (1L, "t", "fr", "s", 1L),
      (2L, "t", "en", "s", 1L), (3L, "t", "fr", "s", 1L),
      (4L, "t", "en", "s", 1L), (5L, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SimilarityQueries.q150CrossLingualPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)), "the translated pair must be found")
    assert(!got.contains((4L, 5L)), "same-language near-dups must be gated out")
  }

  test("q141 estimator: within 25% of a known cardinality at k=64") {
    graft.functions.BoundedMinKDistinct.register(spark)
    // 20_000 distinct ids, each duplicated 3× — duplication must not
    // bias the estimate (the distinct buffer is the point). md5 makes
    // the run deterministic: this is a pinned measurement, not a flaky
    // statistical assertion.
    val n = 20000L
    val ids = spark.range(n * 3).select((col("id") % n).as("user_id"))
    val est = ids
      .select(expr("substr(md5(cast(user_id as string)), 1, 15)").as("hx"))
      .withColumn("hv", expr(Md5Key.hex15ToLong("hx")))
      .agg(expr("bounded_min_k_distinct(hv, 64)").as("hs"))
      .select(expr(
        s"cast(cast(63 as decimal(19,0)) * ${Md5Key.Space} " +
          "div element_at(hs, 64) as bigint)").as("est"))
      .as[Long].head()
    assert(math.abs(est - n) <= n / 4, s"est=$est exact=$n")
  }
}
