package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sharding, TextAnalysis}

/** Round-8 contracts for the widening pack: inverted-index df band and
  * posting determinism, containment's asymmetric-dedup semantics (the
  * case Jaccard structurally misses), split assignment as a stable
  * partition of the corpus, and sessionization boundary arithmetic. */
class Round8Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("invertedIndex: bounded heads hold the k SMALLEST ids sorted, df counts the full set") {
    // 'common' in 5 docs, 'rare' in 1, 'mid' in 3; cap=2 truncates
    // common/mid to their two smallest ids while df stays full
    val docs = Seq(
      (30L, "common mid x1"), (10L, "common mid x2"), (20L, "common mid x3"),
      (40L, "common rare"), (50L, "common x4"))
      .toDF("doc_id", "text")
      .repartition(7) // adversarial layout: head content/order must not move
    val idx = TextAnalysis.invertedIndex(docs, minDf = 2, postingCap = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(!idx.contains("rare"), "df=1 is under the floor")
    assert(idx("common") == (5L, "10,20"), s"full df + 2-id head, got ${idx.get("common")}")
    assert(idx("mid") == (3L, "10,20"), s"got ${idx.get("mid")}")
  }

  test("bounded_min_k: state stays k-capped and the result equals sort-take-k") {
    graft.functions.BoundedMinK.register(spark)
    // 10k values per key across many partitions; heavy key collisions
    val df = spark.range(10000).select(
      pmod(col("id"), lit(3)).as("g"),
      // a permutation of 0..9999, so min-k is a known closed form
      pmod(col("id") * 7919, lit(10000)).as("v"))
      .repartition(16)
    val got = df.groupBy("g").agg(expr("bounded_min_k(v, 5)").as("mk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.collect().groupBy(_.getLong(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted.take(5).toSeq }
    assert(got == want, s"got $got want $want")
    // k larger than the group: whole group, sorted
    val small = Seq((1L, 5L), (1L, 2L)).toDF("g", "v")
      .groupBy("g").agg(expr("bounded_min_k(v, 100)").as("mk"))
      .collect().map(r => r.getSeq[Long](1)).head
    assert(small == Seq(2L, 5L))
  }

  test("containmentPairs flags a verbatim quote inside a long doc that Jaccard misses") {
    // doc 2 = doc 1's text embedded in a much longer document: the
    // contained side's shingles are all present (containment = 1000)
    // while the union is dominated by the container (low Jaccard)
    val quote = (1 to 14).map(i => s"q$i").mkString(" ") // 12 3-shingles
    val filler = (1 to 200).map(i => s"f$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, s"$filler $quote")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, k = 3, minPermille = 800L, minShingles = 10L)
      .collect()
    assert(cont.length == 1, s"exactly the (quote ⊂ long) direction: ${cont.mkString(";")}")
    val r = cont.head
    assert(r.getAs[Long]("contained") == 1L && r.getAs[Long]("container") == 2L)
    assert(r.getAs[Long]("cont_permille") == 1000L)
    // the symmetric gate at its production threshold does not see this pair
    val jac = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.6).collect()
    assert(jac.isEmpty, s"Jaccard@0.6 should miss the quote: ${jac.mkString(";")}")
  }

  test("assignSplits: a stable exhaustive partition, invariant under repartitioning") {
    val docs = (1L to 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = Sharding.assignSplits(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sharding.assignSplits(docs.repartition(13)).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment must be a pure function of (id, seed), not layout")
    assert(a.size == 2000 && a.values.forall(Set("train", "val", "test")))
    val n = a.values.groupBy(identity).view.mapValues(_.size).toMap
    // 12/16-2/16-2/16 of 2000 = 1500/250/250 expected; md5 is uniform
    // enough that ±40% bands can't flake
    assert(n("train") > 1200 && n("train") < 1750, s"train share off: $n")
    assert(n("val") > 150 && n("val") < 400, s"val share off: $n")
    assert(n("test") > 150 && n("test") < 400, s"test share off: $n")
    // seed participates: a different seed must move some docs
    val c = Sharding.assignSplits(docs, seed = 7L).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c, "seed must be part of the hash key")
  }

  test("sessionize arithmetic: a 30-min gap splits, boundary gap does not, ids are time-ordered") {
    import org.apache.spark.sql.expressions.Window
    // user 1: events at t0, +1799s, +3600s → sessions {e1,e2}, {e3}
    // (the 1799s gap holds one session: 1799s < 1800s; the next gap is
    // 1801s > the threshold)
    val base = 1700000000000000L // epoch micros
    val ev = Seq(
      (1L, 1L, base), (2L, 1L, base + 1799L * 1000000L),
      (3L, 1L, base + 3600L * 1000000L),
      (4L, 2L, base)) // user 2: single event → one 0-length session
      .toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val out = ev
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out((1L, 1L)) == (2L, 1799L * 1000000L), s"first session holds the 1799s gap: $out")
    assert(out((1L, 2L)) == (1L, 0L), s"second session is the isolated event: $out")
    assert(out((2L, 1L)) == (1L, 0L), s"single-event user gets session 1: $out")
  }

  test("bigram LM: context-count denominator and closed-form conditional probabilities") {
    // 'a b' ×3, 'a c' ×1 → c1(a)=4: p(b|a)=750000, p(c|a)=250000 (c12
    // ≥3 keeps only 'a b'); doc-final tokens never open a context
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // doc 1 contributes bigrams (a,b),(b,a),(a,b) — b opens a context once
    val out = graft.ops.TextQueries.q128BigramLm _
    val bi = docs.select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> " +
          "named_struct('w1', element_at(w, i + 1), 'w2', element_at(w, i + 2)))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val rows = c12.filter(col("c12") >= 3).join(c1, "w1")
      .withColumn("p_scaled", expr("c12 * 1000000 div c1"))
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        (r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("p_scaled"))).toMap
    assert(rows.keySet == Set(("a", "b")), s"only the ≥3 pair survives: $rows")
    assert(rows(("a", "b")) == (3L, 4L, 750000L), s"p(b|a) = 3/4 scaled: $rows")
    assert(out != null) // silence unused warning; fixture binding smoke-runs in RelationalSpec
  }

  test("histogram-sketch median lands within one bin width of the exact median") {
    val sketch = graft.ops.EventQueries.q129HistQuantile(spark, SparkTestSession.sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    val exact = graft.Tables.events(spark, SparkTestSession.sf)
      .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long").as("c"))
      .groupBy("event_type")
      .agg(expr("percentile(c, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sketch.nonEmpty && sketch.keySet == exact.keySet)
    sketch.foreach { case (t, (n, mn, mx, p50Lo)) =>
      val binWidth = (mx - mn + 1) / 128 + 1
      assert(n > 0 && mn <= p50Lo && p50Lo <= mx, s"$t: edge out of range")
      assert(math.abs(p50Lo - exact(t)) <= binWidth + 1,
        s"$t: sketch $p50Lo vs exact ${exact(t)}, bin width $binWidth")
    }
  }

  test("label centroid similarity: C(L,2) pairs, positive norms, cosine in bounds") {
    val out = graft.ops.SimilarityQueries.q130LabelCentroidSim(spark, SparkTestSession.sf)
      .collect()
    val labels = graft.Tables.embeddings(spark, SparkTestSession.sf)
      .select("label").distinct().count()
    assert(out.length == labels * (labels - 1) / 2,
      s"one row per unordered pair: ${out.length} vs C($labels,2)")
    out.foreach { r =>
      val (d1, d2, cos) =
        (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Double]("cos_sim"))
      assert(d1 > 0 && d2 > 0, "centroid self-dots must be positive")
      assert(cos >= -1.0 - 1e-12 && cos <= 1.0 + 1e-12, s"cosine out of bounds: $cos")
    }
  }

  test("session conversion and latency queries reconcile on the fixture") {
    val sf = SparkTestSession.sf
    val conv = graft.ops.EventQueries.q131SessionConversion(spark, sf).collect()
    val sessions = graft.ops.EventQueries.q125Sessionize(spark, sf)
    // bucket roll-up partitions the session set exactly
    assert(conv.map(_.getLong(1)).sum == sessions.count(),
      "bucket n_sessions must sum to the session count")
    conv.foreach { r =>
      val (b, n, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(b >= 1 && b <= 10 && c >= 0 && c <= n, s"bucket row out of bounds: $r")
    }
    val lat = graft.ops.EventQueries.q132ConversionLatency(spark, sf).collect()
    assert(lat.length == 1)
    val (n, med, p90) = (lat(0).getLong(0), lat(0).getLong(1), lat(0).getLong(2))
    assert(n > 0 && med >= 0 && p90 >= med,
      s"p90 must dominate the median: n=$n med=$med p90=$p90")
  }

  test("conversion latency rank picks match a literal sort on crafted users") {
    // 5 converted users with latencies 10,20,30,40,50s → median rank
    // (5+1) div 2 = 3 → 30s; p90 rank (45+9) div 10 = 5 → 50s; user 9
    // purchases BEFORE any view and must not count
    val base = 1700000000000000L
    val rows = (1 to 5).flatMap { u =>
      Seq((u * 10L + 1L, u.toLong, "view", base),
        (u * 10L + 2L, u.toLong, "purchase", base + u * 10000000L))
    } ++ Seq((91L, 9L, "purchase", base), (92L, 9L, "view", base + 1L))
    val ev = rows.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), lit(0.0).as("value"),
        lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("graft_lat").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.EventQueries.q132ConversionLatency(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 5L, s"only view-then-purchase users count: ${out(0)}")
    assert(out(0).getLong(1) == 30000000L, s"median latency: ${out(0)}")
    assert(out(0).getLong(2) == 50000000L, s"p90 latency: ${out(0)}")
  }

  test("streaming userSessions equals the oracle-gated q125 sessions exactly") {
    // the cross-validation that puts the STATEFUL operator under the
    // DuckDB hash gate by transitivity: userSessions (micros fold) and
    // q125 (lag/running-sum SQL) must produce the identical session
    // multiset on the fixture — sub-ms timestamps included, which is
    // exactly what the former millis fold would have broken
    val sf = SparkTestSession.sf
    val typed = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[graft.streaming.EventStreams.Event]
    val stateful = graft.streaming.EventStreams
      .userSessions(typed, gapMillis = 30 * 60 * 1000)
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"), col("n_events"))
      .collect().map(_.toSeq).toSet
    val sql = graft.ops.EventQueries.q125Sessionize(spark, sf)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toSeq).toSet
    assert(stateful == sql,
      s"missing=${(sql -- stateful).take(3)} extra=${(stateful -- sql).take(3)}")
  }

  test("PMI scaled lift is exact integer arithmetic with a known closed form") {
    // 4 docs; terms a,b together in 2 docs, a alone in 1, b alone in 1:
    // n12=2, n1=3, n2=3, N=4 → lift = 2*4*1e6 div 9 = 888888 (≤ 1e6 ⇒
    // negatively associated, dropped); c,d always together in 3 docs:
    // n12=3, n1=3, n2=3, N=4 → 3*4*1e6 div 9 = 1333333 (kept)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a c d"), (4L, "b e"))
      .toDF("doc_id", "text")
    val t = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
    val nd = docs.count()
    val pairs = t.as("x").join(t.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("x.term") < col("y.term"))
      .groupBy(col("x.term").as("t1"), col("y.term").as("t2"))
      .agg(count(lit(1)).as("n12"))
    val dfreq = t.groupBy("term").agg(count(lit(1)).as("n"))
    val out = pairs
      .join(dfreq.select(col("term").as("t1"), col("n").as("n1")), "t1")
      .join(dfreq.select(col("term").as("t2"), col("n").as("n2")), "t2")
      .withColumn("pmi_scaled", expr(s"n12 * $nd * 1000000 div (n1 * n2)"))
      .collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) -> r.getAs[Long]("pmi_scaled"))
      .toMap
    assert(out(("a", "b")) == 888888L, s"got $out")
    assert(out(("c", "d")) == 1333333L, s"got $out")
  }
}
