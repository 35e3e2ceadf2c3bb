package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sharding, Similarity, TextAnalysis}
import graft.ops.Relational

/** Round-6 operators: semantic dedup over int8 codes, passage-level
  * dedup with reassembly, temperature mixing, the column profiler,
  * recursive CTEs, and RANGE-frame windows. */
class Round6Spec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  // ------------------------------------------------------ semanticDedup

  test("semanticDedup prunes planted identical vectors back to the original") {
    val planted = emb.unionByName(
      emb.filter($"vec_id" < 5)
        .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding", $"label"))
    val out = Similarity.semanticDedup(planted)
    // identical vectors share every sign band and gate at cosine 1
    val pruned = out.filter($"vec_id" >= 1000000L).collect()
    assert(pruned.length == 5)
    assert(pruned.forall(_.getLong(1) == 0L), "copies must not be kept")
    assert(pruned.map(r => (r.getLong(0) - 1000000L, r.getLong(2))).forall {
      case (orig, dupOf) => dupOf == orig
    }, "dup_of must point at the lower-id original")
    // every original stays kept or is pruned by another ORIGINAL
    assert(out.filter($"vec_id" < 1000000L && $"dup_of" >= 1000000L).count() == 0)
  }

  test("semanticDedup emits one verdict row per input vector") {
    val out = Similarity.semanticDedup(emb)
    assert(out.count() == emb.count())
    assert(out.filter(($"kept" === 1L) =!= $"dup_of".isNull).count() == 0)
  }

  test("semanticDedup tightening the gate prunes a subset") {
    val loose = Similarity.semanticDedup(emb, simNumSqE4 = 2025L)
      .filter($"kept" === 0L).select("vec_id").collect().map(_.getLong(0)).toSet
    val tight = Similarity.semanticDedup(emb, simNumSqE4 = 9801L)
      .filter($"kept" === 0L).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(tight.subsetOf(loose), "t=0.99 pruned set must be inside t=0.45's")
  }

  test("semanticDedup resolves a planted 200-clone hot clique exactly") {
    // every clone shares every sign band with vector 0 — the hot-bucket
    // shape; candidates are the clique's ~20k pairs, and the keep-first
    // rule must point every clone at the ORIGINAL (min id), not chain
    val v0 = emb.filter($"vec_id" === 0)
      .select($"embedding").head.getSeq[Float](0).toArray
    val clones = spark.range(1000000L, 1000200L)
      .select($"id".as("vec_id"),
        typedLit(v0).as("embedding"), lit(0).as("label"))
    val out = Similarity.semanticDedup(emb.unionByName(clones))
      .filter($"vec_id" >= 1000000L).collect()
    assert(out.length == 200)
    assert(out.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L),
      "every clone must be pruned by vector 0 itself")
  }

  test("semanticDedup verdict is partitioning-invariant") {
    def run(parts: Int) =
      Similarity.semanticDedup(emb.repartition(parts))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(run(3) == run(7))
  }

  // ------------------------------------------------------ prunePassages

  test("prunePassages keeps only globally-first chunk occurrences") {
    val docs = Seq(
      (1L, "a b c d"),   // chunks [a b] [c d] — both first
      (2L, "a b x y"),   // [a b] repeats doc 1 → dropped; [x y] kept
      (3L, "c d")        // fully duplicate of doc 1's chunk → vanishes
    ).toDF("doc_id", "text")
    val out = TextAnalysis.prunePassages(docs, chunkTokens = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y")))
  }

  test("prunePassages drops in-doc repeats too") {
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.prunePassages(docs, chunkTokens = 2).collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 1L && out(0).getString(3) == "a b")
  }

  test("prunePassages kept-chunk total equals distinct chunk contents") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.prunePassages(docs, chunkTokens = 32)
    val keptTotal = out.agg(sum("n_kept")).as[Long].head()
    val distinctChunks = TextAnalysis.chunkDocs(docs, 32, overlap = 0)
      .select("chunk_text").distinct().count()
    assert(keptTotal == distinctChunks)
  }

  // ----------------------------------------------------- temperatureMix

  test("temperatureMix quotas follow the integer sqrt-weight formula") {
    val docs = Tables.documents(spark, sf)
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = counts.view.mapValues(n => math.floor(math.sqrt(n.toDouble)).toLong).toMap
    val totW = w.values.sum
    val expected = w.view.mapValues(wg => 200L * wg / totW).toMap
    val picked = Sharding.temperatureMix(docs, budget = 200L)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(picked == expected.filter(_._2 > 0))
  }

  test("temperatureMix flattens: big group's pick share < its corpus share") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count().toDouble
    val big = docs.groupBy("lang").count().orderBy($"count".desc).head()
    val picks = Sharding.temperatureMix(docs, budget = 200L)
    val bigPicks = picks.filter($"lang" === big.getString(0)).count().toDouble
    assert(bigPicks / picks.count() < big.getLong(1) / total)
  }

  test("temperatureMix kept set is partitioning-invariant") {
    val docs = Tables.documents(spark, sf)
    def run(parts: Int) =
      Sharding.temperatureMix(docs.repartition(parts), budget = 200L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run(2) == run(9))
  }

  // ----------------------------------------------------------- profiler

  test("q83 profile rows match directly-computed stats") {
    val out = Relational.q83Profile(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 11)
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    assert(out.values.forall(_.getLong(1) == n), "fixture has no nulls")
    assert(out("l_returnflag").getLong(2) ==
      li.select("l_returnflag").distinct().count())
    assert(out("l_quantity").getDouble(3) ==
      li.agg(min("l_quantity")).as[Double].head())
    assert(out("l_returnflag").isNullAt(3) && out("l_returnflag").isNullAt(4))
    assert(out("l_orderkey").isNullAt(5) && out("l_orderkey").isNullAt(6))
  }

  // ------------------------------------------------------ recursive CTE

  test("q85 recursive CTE matches the iterative ancestor chain") {
    val out = Relational.q85Recursive(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = Tables.documents(spark, sf).select("doc_id")
      .as[Long].collect().filter(_ > 0)
    def chain(id: Long): Long = {
      var a = id / 3; var steps = 1L
      while (a > 0) { a = a / 3; steps += 1 }
      steps
    }
    assert(out.size == ids.length)
    ids.foreach(id => assert(out(id) == chain(id), s"doc $id"))
  }

  // -------------------------------------------------- RANGE-frame window

  test("q86 trailing-7-day sums equal a join-based recomputation") {
    val out = graft.ops.EventQueries.q86RangeFrame(spark, sf)
    val daily = out.select("day_int", "day_cents", "n_events")
    val expected = daily.as("a").join(daily.as("b"),
        $"b.day_int".between($"a.day_int" - 6, $"a.day_int"))
      .groupBy($"a.day_int".as("day_int"))
      .agg(sum($"b.day_cents").as("c7_cents"), sum($"b.n_events").as("n7_events"))
    val got = out.select("day_int", "c7_cents", "n7_events")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    expected.collect().foreach { r =>
      assert(got(r.getLong(0)) == ((r.getLong(1), r.getLong(2))), s"day ${r.getLong(0)}")
    }
  }

  // ----------------------------------------------- histogram / correlation

  test("q87 histogram covers every row with monotone contiguous bins") {
    val out = Relational.q87Histogram(spark, sf).orderBy("bin").collect()
    val li = Tables.lineitem(spark, sf)
    assert(out.map(_.getLong(1)).sum == li.count())
    assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 11))
    out.foreach { r =>
      assert(r.getDouble(2) < r.getDouble(3), s"bin ${r.getLong(0)} lo<hi")
    }
    // edges tile [min, max] without gaps
    out.sliding(2).foreach {
      case Array(a, b) if b.getLong(0) == a.getLong(0) + 1 =>
        assert(math.abs(a.getDouble(3) - b.getDouble(2)) < 1e-9)
      case _ =>
    }
  }

  test("q88 decimal-exact correlation agrees with Spark's streaming corr") {
    val out = Relational.q88Correlation(spark, sf).head()
    val r = out.getDouble(6)
    assert(r >= -1.0 && r <= 1.0)
    val streaming = Tables.lineitem(spark, sf)
      .stat.corr("l_quantity", "l_extendedprice")
    assert(math.abs(r - streaming) < 1e-9,
      s"decimal-path r=$r vs streaming corr=$streaming")
  }

  // ------------------------------------------------- funnel / retention

  test("q89 funnel stages only ever shrink and respect event order") {
    val out = graft.ops.EventQueries.q89Funnel(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 3)
    assert(out("1_view") >= out("2_signup_after_view"))
    assert(out("2_signup_after_view") >= out("3_purchase_after_signup"))
    // order-awareness: stage-2 users must be a subset of stage-1 users
    // computed independently
    val ev = Tables.events(spark, sf)
    val viewers = ev.filter($"event_type" === "view")
      .select("user_id").distinct().count()
    assert(out("1_view") == viewers)
  }

  test("q90 retention: offset-0 row equals the cohort size") {
    val out = graft.ops.EventQueries.q90CohortRetention(spark, sf)
    val ev = Tables.events(spark, sf)
    val cohorts = ev.filter($"event_type" === "purchase")
      .groupBy("user_id")
      .agg(min(datediff(to_date($"ts"), lit("1970-01-01").cast("date")).cast("long")).as("cd"))
      .groupBy("cd").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every cohort member purchased (= was active) on day 0
    out.filter($"day_offset" === 0L).collect().foreach { r =>
      assert(r.getLong(2) == cohorts(r.getLong(0)),
        s"cohort ${r.getLong(0)} day-0 retention must equal cohort size")
    }
    assert(out.filter($"day_offset" < 0 || $"day_offset" > 7).count() == 0)
  }

  // ------------------------------------- salted distinct / transitions / scd2

  test("saltedDistinctCount is row-identical to plain countDistinct") {
    val ev = Tables.events(spark, sf)
    val salted = graft.operators.Skew
      .saltedDistinctCount(ev, "event_type", "user_id", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = ev.groupBy("event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("q92 transition shares sum to 1 per source type") {
    val out = graft.ops.EventQueries.q92Transitions(spark, sf)
    out.groupBy("from_type").agg(sum($"p_out").as("s"))
      .collect().foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    // every non-final event contributes exactly one transition
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(out.agg(sum($"n")).as[Long].head() == expected)
  }

  test("q93 SCD-2 intervals chain per user with one open current row") {
    val out = graft.ops.EventQueries.q93Scd2(spark, sf)
    // exactly one NULL eff_to (current version) per user
    val opens = out.filter($"eff_to_s".isNull)
      .groupBy("user_id").count().collect()
    assert(opens.forall(_.getLong(1) == 1L))
    // versions are contiguous and each close matches the next open
    out.orderBy("user_id", "version")
      .collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
        rows.map(_.getLong(2)).zipWithIndex.foreach { case (v, i) =>
          assert(v == i + 1, "versions must be 1..n")
        }
        rows.sliding(2).foreach {
          case Array(a, b) => assert(a.getString(4) == b.getString(3),
            "eff_to must equal the next version's eff_from")
          case _ =>
        }
      }
  }

  test("q94 rolling active: wau >= dau and matches a direct 7-day union") {
    val out = graft.ops.EventQueries.q94RollingActive(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, dau, wau) => wau >= dau })
    // recompute one mid-calendar day's WAU by brute force
    val ev = Tables.events(spark, sf)
      .select($"user_id",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date")).cast("long").as("day"))
    val d = out.map(_._1).sorted.apply(out.length / 2)
    val direct = ev.filter($"day".between(d - 6, d))
      .select("user_id").distinct().count()
    assert(out.find(_._1 == d).get._3 == direct)
  }

  test("q95 latest-per-key keeps exactly each user's most recent event") {
    val out = graft.ops.EventQueries.q95LatestPerKey(spark, sf)
    val ev = Tables.events(spark, sf)
    assert(out.count() == ev.select("user_id").distinct().count())
    // spot-check one user against a direct sort
    val u = ev.select("user_id").head().getLong(0)
    val direct = ev.filter($"user_id" === u)
      .orderBy($"ts".desc, $"event_id".desc).head()
    val got = out.filter($"user_id" === u).head()
    assert(got.getString(1) == direct.getAs[String]("event_type"))
    assert(got.getDouble(2) == direct.getAs[Double]("value"))
  }

  test("q96 percentile bands are ordered and bracket the median") {
    val out = Relational.q96PercentileBand(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val Seq(p25, p50, p75, p90) = (1 to 4).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90)
    }
    // p50 equals the engine's own median
    val med = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(median($"l_extendedprice").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach(r => assert(r.getDouble(2) == med(r.getString(0))))
  }

  test("q97 null-safe join keeps the NULL group a plain join drops") {
    val out = Relational.q97NullSemantics(spark, sf)
    val nullRow = out.filter($"p".isNull).collect()
    assert(nullRow.length == 1 && nullRow(0).getLong(1) > 0,
      "the NULL group must survive the null-safe join")
    // contrast: plain equality silently loses exactly those rows
    val o = Tables.orders(spark, sf)
      .select(expr("nullif(o_orderpriority, '1-URGENT')").as("prio_n"))
    val d = o.select($"prio_n".as("p")).distinct()
    val plain = o.join(d, $"prio_n" === $"p").count()
    assert(plain == out.agg(sum($"n")).as[Long].head() - nullRow(0).getLong(1))
  }

  test("streaming latestPerKey state equals the batch q95 compaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.EventStreams
    def ev(id: Long, sec: Long, user: Long, tpe: String, v: Double) =
      EventStreams.Event(id, new java.sql.Timestamp(sec * 1000), user, tpe, v)
    val ms = MemoryStream[EventStreams.Event]
    val q = EventStreams.latestPerKey(ms.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("stream_latest").start()
    try {
      ms.addData(ev(1, 100, 1, "view", 1.0), ev(2, 200, 1, "click", 2.0))
      q.processAllAvailable()
      // batch 2: a LATER event updates user 1; an EARLIER straggler
      // must NOT displace user 2's newer state
      ms.addData(ev(3, 300, 1, "purchase", 3.0), ev(4, 500, 2, "signup", 4.0))
      q.processAllAvailable()
      ms.addData(ev(5, 400, 2, "error", 5.0))
      q.processAllAvailable()
      // the LAST update per key is the current state
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy($"last_ts".desc, $"last_event_id".desc)
      val finalState = spark.table("stream_latest")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
      assert(finalState(1L) == (("purchase", 3L)))
      assert(finalState(2L) == (("signup", 4L)), "straggler must not win")
    } finally q.stop()
  }

  test("batch latestPerKey equals q95 on the fixture") {
    import graft.streaming.EventStreams
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val fromState = EventStreams.latestPerKey(evs)
      .collect().map(r => r.user_id -> r.last_type).toMap
    val fromBatch = graft.ops.EventQueries.q95LatestPerKey(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fromState == fromBatch)
  }

  test("q98 LATERAL picks each customer's top-2 orders exactly") {
    val out = Relational.q98Lateral(spark, sf)
    // per-customer cap of 2, and the picks match a window-rank rewrite
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val expected = Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
      .select($"o_custkey", $"o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.select($"c_custkey", $"o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("q99 forward-fill carries the last non-null reading, not the null") {
    import graft.ops.EventQueries
    val out = EventQueries.q99ForwardFill(spark, sf)
    val ev = Tables.events(spark, sf)
    // error events must show a value carried from an EARLIER non-error
    // event (or null if none preceded) — spot-check via a join
    val errs = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val joined = out.join(errs, Seq("event_id", "user_id"))
    val filled = joined.filter($"v_filled".isNotNull).count()
    assert(filled > 0, "some error events must inherit a prior reading")
    // non-error events keep their own value verbatim
    val own = out.join(
        ev.filter($"event_type" =!= "error").select($"event_id", $"value"),
        Seq("event_id"))
      .filter($"v_filled" =!= $"value")
    assert(own.count() == 0)
  }

  test("q100 gap fill synthesizes the dense calendar and carries values") {
    // sf0.001 has no value>=300 purchases at all; the gate's sf0.01
    // is where the big-ticket series has its genuine empty days
    val out = graft.ops.EventQueries.q100GapFill(spark, "/root/testdata/sf0.01")
      .orderBy("day_int").collect()
    val days = out.map(_.getLong(0))
    assert(days.last - days.head + 1 == days.length, "calendar must be dense")
    assert(out.exists(_.getLong(2) == 1L), "fixture must have genuine gap days")
    // a gap day's filled value equals the previous day's filled value
    out.sliding(2).foreach {
      case Array(prev, cur) if cur.getLong(2) == 1L =>
        assert(cur.getLong(1) == prev.getLong(1))
      case _ =>
    }
  }

  test("q101 fixed-point PageRank is partitioning-invariant and mass-sane") {
    import graft.ops.TextQueries
    val out = TextQueries.q101PageRank(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // total mass stays within [0.9, 1.0] of SCALE: floor-division loss
    // only ever shrinks it, damping redistributes but never creates
    val mass = out.map(_._3).sum
    assert(mass <= 1000000000000L && mass > 900000000000L, s"mass=$mass")
    // a higher-degree node never ends with base-only rank
    val base = out.map(_._3).min
    assert(out.filter(_._2 > 1).forall(_._3 >= base))
    // determinism across input partitionings (re-run IS the test:
    // the whole chain is integer arithmetic)
    val again = TextQueries.q101PageRank(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
  }

  test("streaming funnelState matches the batch q89 stage counts (in-order feed)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.EventStreams
    def ev(id: Long, sec: Long, user: Long, tpe: String) =
      EventStreams.Event(id, new java.sql.Timestamp(sec * 1000), user, tpe, 1.0)
    val ms = MemoryStream[EventStreams.Event]
    val q = EventStreams.funnelState(ms.toDS(), Seq("view", "signup", "purchase"))
      .writeStream.outputMode("update")
      .format("memory").queryName("stream_funnel").start()
    try {
      // user 1 converts fully across batches; user 2's purchase comes
      // BEFORE its signup in event time — stage must stop at 2
      ms.addData(ev(1, 100, 1, "view"), ev(2, 150, 2, "view"),
        ev(3, 160, 2, "purchase"))
      q.processAllAvailable()
      ms.addData(ev(4, 200, 1, "signup"), ev(5, 300, 1, "purchase"),
        ev(6, 400, 2, "signup"))
      q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy($"stage".desc)
      val finalStage = spark.table("stream_funnel")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(finalStage(1L) == 3L, "in-order view->signup->purchase converts")
      assert(finalStage(2L) == 2L, "purchase before signup must not count")
    } finally q.stop()
  }

  test("funnelState resolves equal-timestamp chains regardless of event_id order") {
    import graft.streaming.EventStreams
    import spark.implicits._
    // successor stage has the SMALLER event_id at the SAME timestamp:
    // a single sorted pass would skip it; the fixpoint re-scan must
    // reach stage 2 (q89's ts >= t1 counts it)
    val evs = Seq(
      EventStreams.Event(1L, new java.sql.Timestamp(100000L), 7L, "signup", 1.0),
      EventStreams.Event(2L, new java.sql.Timestamp(100000L), 7L, "view", 1.0)
    ).toDS()
    val out = EventStreams.funnelState(evs, Seq("view", "signup")).collect()
    assert(out.length == 1 && out(0).stage == 2L)
  }

  test("Memo.invalidatePath drops only entries reading the rewritten path") {
    import graft.ops.Memo
    import spark.implicits._
    val dir1 = java.nio.file.Files.createTempDirectory("graft_inv1").toString + "/t"
    val dir2 = java.nio.file.Files.createTempDirectory("graft_inv2").toString + "/t"
    Seq(1L, 2L).toDF("v").write.parquet(dir1)
    Seq(1L, 2L, 3L).toDF("v").write.parquet(dir2)
    assert(Memo.of(spark, "r6spec:inv1") { spark.read.parquet(dir1) }.count() == 2)
    assert(Memo.of(spark, "r6spec:inv2") { spark.read.parquet(dir2) }.count() == 3)
    // rewrite both paths OUTSIDE any Spark write (an in-app Spark
    // overwrite triggers cacheManager.recacheByPath and self-heals;
    // the contract's hazard is the external rewrite, simulated here
    // by swapping the directory's files on the filesystem)
    def extRewrite(dir: String, rows: Seq[Long]): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("graft_inv_s").toString + "/t"
      rows.toDF("v").coalesce(1).write.parquet(staging)
      val target = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(target).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      java.nio.file.Files.move(java.nio.file.Paths.get(staging), target)
    }
    extRewrite(dir1, Seq(1L, 2L, 3L, 4L))
    extRewrite(dir2, Seq(9L))
    Memo.invalidatePath(dir1)
    assert(Memo.of(spark, "r6spec:inv1") { spark.read.parquet(dir1) }.count() == 4,
      "invalidated entry must rebuild against the rewritten files")
    assert(Memo.of(spark, "r6spec:inv2") { spark.read.parquet(dir2) }.count() == 3,
      "unrelated entry must survive, still serving its persisted frame " +
        "(the documented staleness hazard — which is why writers invalidate)")
    Memo.clear(spark)
  }

  test("batch funnelState stage counts equal q89 on the fixture") {
    import graft.streaming.EventStreams
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val staged = EventStreams.funnelState(evs, Seq("view", "signup", "purchase"))
      .collect().map(_.stage)
    val counts = Map(
      "1_view" -> staged.count(_ >= 1).toLong,
      "2_signup_after_view" -> staged.count(_ >= 2).toLong,
      "3_purchase_after_signup" -> staged.count(_ >= 3).toLong)
    val batch = graft.ops.EventQueries.q89Funnel(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == batch)
  }

  test("q102 listagg order is deterministic and round-trips its members") {
    val out = Relational.q102Listagg(spark, sf).collect()
    // one collect, grouped and sorted driver-side (not one Spark job
    // per nation)
    val byNation = Tables.customer(spark, sf)
      .select($"c_nationkey".cast("long"), $"c_acctbal", $"c_name")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (-r.getDouble(1), r.getString(2)))
        .map(_.getString(2)).toSeq)
      .toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val names = r.getString(2).split(",")
      assert(names.length == r.getLong(1))
      assert(names.toSeq == byNation(r.getAs[Number](0).longValue()))
    }
  }

  test("q103 try_cast nulls malformed input instead of failing the job") {
    val out = graft.ops.EventQueries.q103TryCast(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), "every props.k must parse")
      assert(r.getLong(4) == 0L, "no event-type word may parse as a number")
    }
  }

  test("q86 RANGE frame spans gap days (unlike a ROWS frame)") {
    // if the fixture has >= 7 distinct days, every window past the 7th
    // day must cover at most 7 day-rows but ALWAYS a 7-day value span
    val out = graft.ops.EventQueries.q86RangeFrame(spark, sf).orderBy("day_int")
    val days = out.select("day_int").as[Long].collect()
    assert(days.length == days.distinct.length)
    // trailing window never sums more than the full-corpus total
    val tot = out.agg(sum("day_cents")).as[Long].head()
    assert(out.filter($"c7_cents" > tot).count() == 0)
  }
}
