package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, TextAnalysis}
import graft.ops.EventQueries

/** Round-9 depth additions: LM-based quality scoring (q151), session
  * path trigrams (q152), median-of-means robust statistics (q153),
  * vocabulary OOV audit (q154), and the shared count-min operator's
  * streaming form. Closed-form fixtures throughout — every assertion
  * is an exact integer the operator must reproduce. */
class Round9DepthSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ---- q151: LM mean-probability scoring --------------------------------

  test("lm score: closed form — seen bigrams score p_scaled, unseen score 0") {
    // doc 1 "a b a b a b": bigrams (a,b)x3 (b,a)x2; model at minCount=3
    // keeps only (a,b): c12=3, c1(context a)=3, p=10^6. doc 2's single
    // bigram is floored out of the model entirely.
    val docs = Seq((1L, "a b a b a b"), (2L, "z q")).toDF("doc_id", "text")
    val model = TextAnalysis.bigramModel(docs, minCount = 3L)
    assert(model.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq(("a", "b", 3L, 3L, 1000000L)))
    val scores = TextAnalysis.lmMeanScore(docs, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: (3*10^6 + 2*0) div 5 = 600000 over 5 bigrams
    assert(scores(1L) == (5L, 600000L))
    // doc 2: its only bigram is unseen -> score 0
    assert(scores(2L) == (1L, 0L))
  }

  test("lm score: sub-2-token docs are absent (no bigram support)") {
    val docs = Seq((1L, "only"), (2L, "a b")).toDF("doc_id", "text")
    val model = TextAnalysis.bigramModel(docs, minCount = 1L)
    val ids = TextAnalysis.lmMeanScore(docs, model)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  // ---- q152: session path trigrams --------------------------------------

  private def ev(id: Long, user: Long, sec: Long, tpe: String) =
    (id, user, sec * 1000000L, tpe)

  private def eventsDf(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), lit(0.0).as("value"),
        lit("").as("props"))

  test("path trigrams: journeys fold per session under the total order") {
    val rows = Seq(
      // user 1, session 1: A B C D -> A>B>C, B>C>D
      ev(1, 1, 0, "A"), ev(2, 1, 10, "B"), ev(3, 1, 20, "C"), ev(4, 1, 30, "D"),
      // user 1, session 2 (2h later): A B C -> A>B>C again
      ev(5, 1, 7200, "A"), ev(6, 1, 7210, "B"), ev(7, 1, 7220, "C"),
      // user 2: only two events -> no trigram
      ev(8, 2, 0, "A"), ev(9, 2, 10, "B"))
    val got = EventQueries.pathTrigrams(eventsDf(rows))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A>B>C" -> 2L, "B>C>D" -> 1L))
  }

  test("path trigrams: the 30-min gap splits a would-be trigram") {
    // gap of exactly 1800s holds the session; 1801s splits it
    val held = Seq(ev(1, 1, 0, "A"), ev(2, 1, 1800, "B"), ev(3, 1, 3600, "C"))
    val split = Seq(ev(1, 1, 0, "A"), ev(2, 1, 1801, "B"), ev(3, 1, 3602, "C"))
    assert(EventQueries.pathTrigrams(eventsDf(held)).count() == 1L)
    assert(EventQueries.pathTrigrams(eventsDf(split)).count() == 0L)
  }

  test("path trigrams: equal timestamps order by event_id") {
    val rows = Seq(ev(3, 1, 0, "C"), ev(1, 1, 0, "A"), ev(2, 1, 0, "B"))
    val got = EventQueries.pathTrigrams(eventsDf(rows))
      .collect().map(r => r.getString(0)).toSeq
    assert(got == Seq("A>B>C"))
  }

  // ---- q153: median-of-means --------------------------------------------

  private def valEv(id: Long, tpe: String, v: Double) =
    (id, tpe, v)

  private def valEventsDf(rows: Seq[(Long, String, Double)]) =
    rows.toDF("event_id", "event_type", "value")
      .select(col("event_id"), expr("timestamp_micros(event_id)").as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"),
        lit("").as("props"))

  test("median-of-means: one adversarial row cannot move the estimate") {
    // 480 clean rows at 1.00 + one at 10^7: the outlier pollutes exactly
    // one of 16 buckets, the median of bucket means ignores it, the
    // plain mean does not — the estimator's defining property
    val rows = (1L to 480L).map(valEv(_, "x", 1.0)) :+
      valEv(481L, "x", 1.0e7)
    val r = EventQueries.medianOfMeans(valEventsDf(rows)).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_events")) == 481L)
    assert(row.getLong(row.fieldIndex("mom_cents")) == 100L)
    assert(row.getLong(row.fieldIndex("mean_cents")) > 100000L)
  }

  test("median-of-means: negative cents floor (not truncate) toward -inf") {
    // floor(-0.015 * 100) = -2 cents; a single-value bucket's mean must
    // floor the same way Spark div would NOT (truncation gives -1)
    val rows = (1L to 3L).map(valEv(_, "n", -0.015))
    val r = EventQueries.medianOfMeans(valEventsDf(rows)).collect().head
    assert(r.getLong(r.fieldIndex("mom_cents")) == -2L)
    assert(r.getLong(r.fieldIndex("mean_cents")) == -2L)
  }

  // ---- q154: OOV rate ----------------------------------------------------

  test("oov rate: closed form under a 2-term vocabulary") {
    // counts: x=3 y=2 z=1 w=1 -> vocab {x, y}; stratum (en,s1) has 0
    // OOV of 4 tokens, (de,s2) has 2 of 3 -> 666 permille
    val docs = Seq(
      (1L, "x x x y", "en", "s1"),
      (2L, "y z w", "de", "s2")).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.oovRate(docs, vocabSize = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      ("en", "s1") -> (4L, 0L, 0L),
      ("de", "s2") -> (3L, 2L, 666L)))
  }

  test("oov rate: vocab boundary tie breaks on the term string") {
    // a=2 b=2 c=2 with vocabSize=2 -> vocab {a, b} (count ties order by
    // term), so every c token is OOV — the rank-k boundary is
    // deterministic, not partition-dependent
    val docs = Seq((1L, "a a b b c c", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.oovRate(docs, vocabSize = 2).collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (6L, 2L, 333L))
  }

  // ---- q155: audience overlap --------------------------------------------

  test("audience overlap: closed-form Jaccard, duplicates collapse") {
    // type A users {1,2,3} (user 1 twice — distinct first), type B
    // users {2,3,4}: common 2, union 4 -> 500 permille
    val rows = Seq(
      ev(1, 1, 0, "A"), ev(2, 1, 10, "A"), ev(3, 2, 0, "A"), ev(4, 3, 0, "A"),
      ev(5, 2, 0, "B"), ev(6, 3, 0, "B"), ev(7, 4, 0, "B"))
    val got = EventQueries.audienceOverlap(eventsDf(rows)).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getString(1)) == ("A", "B"))
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      (2L, 3L, 3L, 500L))
  }

  test("audience overlap: disjoint audiences report 0 permille") {
    val rows = Seq(ev(1, 1, 0, "A"), ev(2, 2, 0, "B"))
    val got = EventQueries.audienceOverlap(eventsDf(rows)).collect()
    assert(got.isEmpty) // no shared user -> no pair row at all
  }

  // ---- q156: daily-volume autocorrelation --------------------------------

  private def dayEvents(tpe: String, dayCounts: Seq[(Long, Int)],
                        idBase: Long = 0L): Seq[(Long, Long, Long, String)] = {
    var id = idBase
    dayCounts.flatMap { case (day, n) =>
      (1 to n).map { i =>
        id += 1
        ev(id, id, day * 86400L + i, tpe)
      }
    }
  }

  test("volume autocorrelation: a perfect linear ramp scores r = 1") {
    // daily counts 1,2,3,4,5 -> the 4 lag-1 pairs are collinear
    val rows = dayEvents("x", Seq((0L, 1), (1L, 2), (2L, 3), (3L, 4), (4L, 5)))
    val r = EventQueries.volumeAutocorr(eventsDf(rows)).collect().head
    assert(r.getLong(r.fieldIndex("n_pairs")) == 4L)
    assert(math.abs(r.getDouble(r.fieldIndex("r")) - 1.0) < 1e-9)
  }

  test("volume autocorrelation: a calendar gap breaks the pair chain") {
    // days 0,1,3,4 observed: only (0,1) and (3,4) are consecutive
    val rows = dayEvents("x", Seq((0L, 2), (1L, 3), (3L, 5), (4L, 2)))
    val r = EventQueries.volumeAutocorr(eventsDf(rows)).collect().head
    assert(r.getLong(r.fieldIndex("n_pairs")) == 2L)
  }

  // ---- q157: dedup threshold yield curve ---------------------------------

  test("yield curve: integer gates are exact at every boundary") {
    // ratios: (1,2)=6/14≈0.43, (1,3)=9/11≈0.82, (2,3)=10/10=1.0
    val pairs = Seq(
      (1L, 2L, 6L, 10L, 10L),
      (1L, 3L, 9L, 10L, 10L),
      (2L, 3L, 10L, 10L, 10L)).toDF("d1", "d2", "common", "n1", "n2")
    val got = graft.operators.Dedup
      .yieldCurve(pairs, Seq(600L, 800L, 900L, 1000L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      600L -> (2L, 1L),   // (1,3) and (2,3), both flag doc 3
      800L -> (2L, 1L),   // 9*1000 >= 800*11 still holds
      900L -> (1L, 1L),   // (1,3) drops: 9000 < 9900
      1000L -> (1L, 1L))) // exact-equality boundary: 10000 >= 1000*10
  }

  // ---- q158: MERGE INTO / CDC apply --------------------------------------

  test("applyChanges: last-wins, delete-after-upsert deletes, later upsert resurrects") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (2L, 1L, "upsert", "b2"), // then deleted at seq 2 -> gone
      (2L, 2L, "delete", null),
      (3L, 1L, "delete", null), // then re-upserted at seq 2 -> c2
      (3L, 2L, "upsert", "c2"),
      (4L, 1L, "upsert", "d")   // brand-new key
    ).toDF("id", "seq", "op", "v")
    val got = graft.operators.Maintenance
      .applyChanges(base, changes, key = "id", seqCol = "seq")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 3L -> "c2", 4L -> "d"))
  }

  test("applyChanges: an all-delete feed empties the touched keys only") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val changes = Seq((1L, 1L, "delete", null)).toDF("id", "seq", "op", "v")
    val got = graft.operators.Maintenance
      .applyChanges(base, changes, key = "id", seqCol = "seq")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "b"))
  }

  test("streaming cdcView ≡ batch applyChanges; low-seq straggler can't resurrect") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreams
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStreams.Change]
    val q = EventStreams.cdcView(ms.toDS()).writeStream
      .format("memory").queryName("cdc_view")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: upserts for 1..3; batch 2: delete 2 at seq 5, THEN a
      // straggler upsert for 2 at seq 3 in batch 3 — must stay dead
      ms.addData(
        EventStreams.Change(1L, 1L, "upsert", "a"),
        EventStreams.Change(2L, 1L, "upsert", "b"),
        EventStreams.Change(3L, 1L, "upsert", "c"))
      q.processAllAvailable()
      ms.addData(EventStreams.Change(2L, 5L, "delete", null),
        EventStreams.Change(3L, 2L, "upsert", "c2"))
      q.processAllAvailable()
      ms.addData(EventStreams.Change(2L, 3L, "upsert", "b-straggler"))
      q.processAllAvailable()
      // Update-mode memory sink appends each emitted revision; the
      // view is the highest-seq row per key
      val view = spark.table("cdc_view")
        .groupBy("id").agg(max(struct(col("seq"), col("alive"),
          col("payload"))).as("s"))
        .select(col("id"), col("s.alive"), col("s.payload"))
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1),
          Option(r.getString(2)))).toMap
      assert(view(1L) == (true, Some("a")))
      assert(view(2L) == (false, None))        // tombstone survives the straggler
      assert(view(3L) == (true, Some("c2")))
      // batch equivalence: alive rows == applyChanges on the full feed
      val base = Seq.empty[(Long, String)].toDF("id", "v")
      val allChanges = Seq(
        (1L, 1L, "upsert", "a"), (2L, 1L, "upsert", "b"),
        (3L, 1L, "upsert", "c"), (2L, 5L, "delete", null),
        (3L, 2L, "upsert", "c2"), (2L, 3L, "upsert", "b-straggler")
      ).toDF("id", "seq", "op", "v")
      val batch = graft.operators.Maintenance
        .applyChanges(base, allChanges, key = "id", seqCol = "seq")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val alive = view.collect { case (k, (true, Some(p))) => k -> p }
      assert(alive == batch)
    } finally q.stop()
  }

  // ---- q159: point-in-time snapshot --------------------------------------

  test("as-of snapshot ≡ SCD2 interval containment at T") {
    // the fast pre-T-filter + latest-per-key read must answer the same
    // question as filtering q93's intervals by eff_from <= T < eff_to
    // (string compare is safe on the fixed yyyy-MM-dd HH:mm:ss format)
    val t = "2024-01-15 00:00:00"
    val fast = EventQueries.q159AsOfSnapshot(spark, SparkTestSession.sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val intervals = EventQueries.q93Scd2(spark, SparkTestSession.sf)
      .filter(col("eff_from_s") <= t &&
        (col("eff_to_s").isNull || col("eff_to_s") > t))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(fast.nonEmpty)
    assert(fast == intervals)
  }

  // ---- degenerate inputs: every new operator returns empty, not throws ---

  test("depth operators: empty and degenerate inputs yield empty frames") {
    val noDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val noEvents = eventsDf(Seq.empty)
    assert(TextAnalysis.lmMeanScore(noDocs,
      TextAnalysis.bigramModel(noDocs)).count() == 0L)
    assert(TextAnalysis.oovRate(noDocs).count() == 0L)
    assert(EventQueries.pathTrigrams(noEvents).count() == 0L)
    assert(EventQueries.medianOfMeans(noEvents).count() == 0L)
    assert(EventQueries.audienceOverlap(noEvents).count() == 0L)
    assert(EventQueries.volumeAutocorr(noEvents).count() == 0L)
    // single-day volume: no lag-1 pair -> type absent, not a null row
    val oneDay = dayEvents("x", Seq((0L, 3)))
    assert(EventQueries.volumeAutocorr(eventsDf(oneDay)).count() == 0L)
    // one-bucket median-of-means: the median of one mean is that mean
    val one = Seq(valEv(1L, "solo", 2.0))
    val r = EventQueries.medianOfMeans(valEventsDf(one)).collect().head
    assert(r.getLong(r.fieldIndex("mom_cents")) == 200L)
  }

  // ---- count-min: shared operator, streaming form ------------------------

  test("count-min counters: streaming Complete mode ≡ batch, across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val counters = Sketches.countMinCounters(
      ms.toDF().withColumnRenamed("value", "user_id"), "user_id")
    val q = counters.writeStream
      .format("memory").queryName("cm_stream")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      // the same key re-arriving in a later micro-batch must ADD to its
      // counters (frequency semantics), not re-insert (set semantics)
      ms.addData(1L to 50L: _*)
      q.processAllAvailable()
      ms.addData((1L to 25L) ++ (100L to 120L): _*)
      q.processAllAvailable()
      val streamed = spark.table("cm_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Sketches.countMinCounters(
        ((1L to 50L) ++ (1L to 25L) ++ (100L to 120L)).toDF("user_id"),
        "user_id")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      assert(streamed.keys.map(_._1).toSet == Set(0, 1, 2))
    } finally q.stop()
  }
}
