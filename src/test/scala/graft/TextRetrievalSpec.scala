package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sharding, TextAnalysis}

/** Planted-semantics specs for the retrieval/packing additions:
  * BM25 ranking, concat-and-chunk sequence packing, and the
  * sketch-bound guarantees q73 asserts through the oracle gate.
  */
class TextRetrievalSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------- bm25

  private val plantedDocs = Seq(
    (1L, "spark spark spark alpha beta"),   // tf=3, short
    (2L, "spark gamma delta epsilon zeta"), // tf=1, same length
    (3L, "alpha beta gamma delta epsilon"), // no query term
    (4L, "spark spark eta theta iota kappa lambda mu nu xi")) // tf=2, longer
    .toDF("doc_id", "text")

  test("bm25: higher tf wins at equal length; termless docs don't appear") {
    val ranked = TextAnalysis.bm25TopK(plantedDocs, Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranked.size == 3, "doc 3 has no query term and must be absent")
    assert(!ranked.contains(3L))
    assert(ranked(1L) < ranked(2L), "tf=3 must outrank tf=1 at equal dl")
    // doc 4 has tf=2 but is twice as long — length normalization (b)
    // must place it below the short tf=3 doc
    assert(ranked(1L) < ranked(4L))
  }

  test("bm25: canonical log-idf variant preserves the planted ordering") {
    val raw = TextAnalysis.bm25TopK(plantedDocs, Seq("spark"), k = 10)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val ln = TextAnalysis.bm25TopK(plantedDocs, Seq("spark"), k = 10, logIdf = true)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(raw == ln, "single-term ranking is idf-monotone: variants must agree")
  }

  test("bm25: multi-term query sums evidence across terms") {
    val docs = Seq(
      (1L, "spark join alpha beta gamma"),  // both terms once
      (2L, "spark alpha beta gamma delta"), // one term once
      (3L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val ranked = TextAnalysis.bm25TopK(docs, Seq("spark", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranked(1L) < ranked(2L), "two matched terms must outrank one")
    assert(!ranked.contains(3L))
  }

  // ------------------------------------------- sequence packing (q71)

  private def packed(seqLen: Long) =
    Sharding.packSequences(
      Tables.documents(spark, SparkTestSession.sf), seqLen = seqLen)

  test("packSequences is lossless: per-doc fragment lengths sum to the doc's tokens") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val bad = packed(64)
      .groupBy("doc_id").agg(sum("frag_len").as("packed"))
      .join(docs, Seq("doc_id"), "full_outer")
      .filter($"packed".isNull || $"n".isNull || $"packed" =!= $"n")
    assert(bad.count() == 0)
  }

  test("packSequences tiles: every sequence but the stream's last is exactly full") {
    val perSeq = packed(64)
      .groupBy("source", "seq_id")
      .agg(sum("frag_len").as("fill"), min("seq_offset").as("off0"))
    val lastSeq = perSeq.groupBy("source").agg(max("seq_id").as("last_id"))
    val nonLast = perSeq.join(lastSeq, Seq("source"))
      .filter($"seq_id" =!= $"last_id")
    assert(nonLast.filter($"fill" =!= 64L || $"off0" =!= 0L).count() == 0,
      "a non-final sequence with fill != seqLen means the tape has gaps")
  }

  test("packSequences is partitioning-invariant (a pure function of stream order)") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val a = Sharding.packSequences(docs, 64).collect().map(_.toSeq).toSet
    val b = Sharding.packSequences(docs.repartition(7), 64)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("packSequences splits an over-long doc across consecutive sequences") {
    val one = Seq(("s", 1L, Seq.fill(150)("w").mkString(" ")))
      .toDF("source", "doc_id", "text")
    val frags = Sharding.packSequences(one, 64)
      .orderBy("seq_id")
      .select("seq_id", "frag_start", "frag_len", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(frags.toSeq == Seq((0L, 0L, 64L, 0L), (1L, 64L, 64L, 0L), (2L, 128L, 22L, 0L)))
  }

  test("packSequences substream valve: bounded tapes, still lossless, flush at block edges") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val packed = Sharding.packSequences(docs, 64, substreamDocs = Some(50L))
    // lossless: per-doc fragment tokens still sum to the doc's tokens
    val n = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val bad = packed.groupBy("doc_id").agg(sum("frag_len").as("packed"))
      .join(n, Seq("doc_id")).filter($"packed" =!= $"n")
    assert(bad.count() == 0)
    // block membership is orderCol div S
    assert(packed.filter($"substream" =!= expr("doc_id div 50")).count() == 0)
    // every tape starts at sequence 0, offset 0 (the flush semantics)
    val starts = packed.groupBy("source", "substream")
      .agg(min("seq_id").as("s0"), min("seq_offset").as("o0"))
    assert(starts.filter($"s0" =!= 0L || $"o0" =!= 0L).count() == 0)
    // within a block, packing matches the single-tape packer applied
    // to just that block's docs
    val oneBlock = docs.filter($"doc_id" >= 50 && $"doc_id" < 100)
    val alone = Sharding.packSequences(oneBlock, 64)
      .select("doc_id", "seq_id", "frag_start", "frag_len", "seq_offset")
      .collect().map(_.toSeq).toSet
    val inFull = packed.filter($"substream" === 1L && $"source" === "src0")
      .select("doc_id", "seq_id", "frag_start", "frag_len", "seq_offset")
      .collect().map(_.toSeq).toSet
    val aloneSrc0 = Sharding.packSequences(
        oneBlock.filter($"source" === "src0"), 64)
      .select("doc_id", "seq_id", "frag_start", "frag_len", "seq_offset")
      .collect().map(_.toSeq).toSet
    assert(inFull == aloneSrc0,
      "a substream's packing must equal the single-tape packer on its own docs")
    assert(alone.nonEmpty && inFull.nonEmpty)
  }

  // ------------------------------------------------ sketch bounds (q73)

  test("sketch bounds hold: HLL within 3-sigma, approx percentile within a unit") {
    val row = ops.Relational.q73SketchBounds(spark, SparkTestSession.sf).first()
    assert(row.getAs[Long]("hll_within_bound") == 1L)
    assert(row.getAs[Long]("p50_within_bound") == 1L)
  }

  // -------------------------------------------- int8 quantization

  test("int8 quantization: tinyint storage, cosine-faithful reconstruction, top-k agreement") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, SparkTestSession.sf)
    val quant = Similarity.quantizeInt8(emb)
    assert(quant.schema("q").dataType.simpleString == "array<tinyint>",
      s"int8 storage claim: got ${quant.schema("q").dataType.simpleString}")
    val recon = Similarity.dequantize(quant)
      .withColumn("cos_rec", Similarity.cosine(
        expr("transform(embedding, x -> cast(x as double))"), $"dq"))
    val worst = recon.agg(min("cos_rec")).first().getDouble(0)
    assert(worst >= 0.999, s"worst reconstruction cosine $worst")
    // retrieval survives quantization: top-10 on reconstructed vectors
    // agrees with exact top-10 on the raw vectors
    val dq = recon.select($"vec_id", $"dq".as("embedding"))
    val approx = Similarity.bruteForceTopK(dq, dq.filter($"vec_id" < 10), k = 10)
      .select("query_id", "neighbor_id")
    val exact = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10), k = 10)
      .select("query_id", "neighbor_id")
    val hits = approx.join(exact, Seq("query_id", "neighbor_id")).count()
    assert(hits >= 95, s"quantized recall@10 over 10 queries: $hits/100")
  }

  test("quantization handles a constant vector without ANSI division failure") {
    import graft.operators.Similarity
    val one = Seq((1L, Seq.fill(8)(0.25f))).toDF("vec_id", "embedding")
    val r = Similarity.dequantize(Similarity.quantizeInt8(one))
      .select(expr("aggregate(dq, 0.0d, (a, x) -> a + abs(x - 0.25d))"))
      .first().getDouble(0)
    assert(r < 1e-9, s"constant vector must reconstruct exactly, err=$r")
  }

  test("approx_count_distinct stays in bound on an adversarial skewed set") {
    // one hot key + a long unique tail — the cardinality shape HLL
    // sees in event streams
    val df = spark.range(100000)
      .select(when($"id" % 2 === 0, 0L).otherwise($"id").as("k"))
    val r = df.agg(
      countDistinct($"k").as("exact"),
      approx_count_distinct($"k", 0.02).as("apx")).first()
    val (exact, apx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(apx - exact).toDouble <= 0.06 * exact,
      s"HLL estimate $apx vs exact $exact breaches the 3-sigma bound")
  }

  // -------------------------------------------- tf-idf cosine pairs

  test("tfidf cosine pairs: rare-term twins pair; stop-term-only overlap doesn't under maxDf") {
    // docs 1+2 share rare terms (high weight); docs 3+4 share only the
    // corpus-wide stop term, which the df cap removes entirely.
    // Expected cosine for (1,2): 3 shared df=2 terms (w=5000) + 1
    // unique df=1 term (w=10000) each → 75e6/175e6 ≈ 0.43.
    val docs = Seq(
      (1L, "zebra quark boson lepton the"),
      (2L, "zebra quark boson hadron the"),
      (3L, "apple the"),
      (4L, "banana the")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.tfidfCosinePairs(docs, threshold = 0.4,
        maxDf = Some(3))
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"rare-term twins must pair, got $pairs")
    assert(!pairs.contains((3L, 4L)),
      s"stop-term-only overlap must not pair under the df cap, got $pairs")
  }

  test("tfidf cosine pairs: tf weighting separates what Jaccard cannot") {
    // same term SET (Jaccard = 1.0) but very different term-frequency
    // profiles -> cosine over tf-weighted vectors drops below a high
    // threshold while a set-based measure is blind to the difference
    val docs = Seq(
      (1L, "alpha " * 9 + "beta"),
      (2L, "beta " * 9 + "alpha")
    ).map { case (id, t) => (id, t.trim) }.toDF("doc_id", "text")
    val high = TextAnalysis.tfidfCosinePairs(docs, threshold = 0.9).count()
    val low = TextAnalysis.tfidfCosinePairs(docs, threshold = 0.2).count()
    assert(high == 0L, "orthogonal-ish tf profiles must fail a 0.9 threshold")
    assert(low == 1L, "the shared-vocabulary pair must pass a 0.2 threshold")
  }

  test("tfidf cosine pairs: empty and degenerate inputs yield empty, not errors") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.tfidfCosinePairs(empty).count() == 0L)
    val one = Seq((1L, "solo doc")).toDF("doc_id", "text")
    assert(TextAnalysis.tfidfCosinePairs(one).count() == 0L)
  }

  // ------------------------------------------------------ train order

  test("train order: partitioning-independent, uniform-ish shards, contiguous positions") {
    val docs = Tables.documents(spark, SparkTestSession.sf).select("doc_id")
    val a = Sharding.trainOrder(docs, nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Sharding.trainOrder(docs.repartition(13), nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b),
      "order must not depend on physical partitioning (the reproducibility claim)")
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    byShard.foreach { case (s, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.sameElements(1L to rows.length.toLong),
        s"shard $s positions must be contiguous 1..n, got ${ps.take(5).mkString(",")}…")
    }
    // a different seed yields a different permutation (independence)
    val c = Sharding.trainOrder(docs, nShards = 8, seed = 7L)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(!a.sameElements(c), "changing the seed must change the order")
  }

  // --------------------------------------------------- phrase search

  test("phraseOccurrences: exact consecutive matches only, overlaps and repeats handled") {
    val docs = Seq(
      (1L, "x a b c y a b c"),      // two occurrences, first at pos 1
      (2L, "a b x c"),              // all terms present, never consecutive
      (3L, "a b"),                  // prefix only — no match
      (4L, "c b a"),                // reversed — no match
      (5L, "a b c")                 // exact doc == phrase, anchor 0
    ).toDF("doc_id", "text")
    val phrase = Seq((0, "a"), (1, "b"), (2, "c")).toDF("slot", "term")
    val got = TextAnalysis.phraseOccurrences(docs, phrase, phraseLen = 3)
      .select($"doc_id", $"n_occ", $"first_pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, 1L), (5L, 1L, 0L)))
  }

  test("phraseOccurrences: a repeated phrase term needs distinct positions per slot") {
    // phrase "a a b": doc 1 has it ("a a b"), doc 2 has only one 'a'
    // before 'b' — a single token must not satisfy both 'a' slots
    val docs = Seq(
      (1L, "x a a b"),
      (2L, "x a b b")
    ).toDF("doc_id", "text")
    val phrase = Seq((0, "a"), (1, "a"), (2, "b")).toDF("slot", "term")
    val got = TextAnalysis.phraseOccurrences(docs, phrase, phraseLen = 3)
      .select($"doc_id", $"n_occ", $"first_pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 1L)))
  }

  test("phraseOccurrences: layout-invariant across partitionings") {
    val docs = (1L to 200L)
      .map(i => (i, if (i % 7 == 0) s"pre tok$i alpha beta gamma post"
                    else s"tok$i alpha gamma beta"))
      .toDF("doc_id", "text")
    val phrase = Seq((0, "alpha"), (1, "beta"), (2, "gamma")).toDF("slot", "term")
    def run(parts: Int) =
      TextAnalysis.phraseOccurrences(docs.repartition(parts), phrase, 3)
        .select($"doc_id", $"n_occ", $"first_pos")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expected = (1L to 200L).filter(_ % 7 == 0).map(i => (i, 1L, 2L))
    assert(run(1) == expected)
    assert(run(32) == expected)
  }

  test("proximityMinSpan: true minimum over combos, any order; missing term drops the doc") {
    val docs = Seq(
      (1L, "t0 x x t1 t2"),                    // single combo: span 4
      (2L, "t0 x t1 x x x t2 t0 t1 t2"),       // late cluster (7,8,9) beats early (0,2,6)
      (3L, "t2 t1 t0"),                        // reversed order still spans 2
      (4L, "t0 t1 x x x x x x x x t0 x t1"),   // t2 missing -> absent
      (5L, "x t1 t0 t2 x")                     // span 2 around the middle
    ).toDF("doc_id", "text")
    val slots = Seq((0, "t0"), (1, "t1"), (2, "t2")).toDF("slot", "term")
    val got = graft.operators.TextAnalysis.proximityMinSpan(docs, slots, k = 16)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L), (2L, 2L), (3L, 2L), (5L, 2L)))
  }

  test("proximityMinSpan: the k cap is first-k-occurrences semantics, exactly") {
    // t0 at positions 0..19, t1 at 20, t2 at 21. With k = 16 only
    // t0's first 16 positions (0..15) are scored, so the minimal span
    // is 21 - 15 = 6 — NOT 2 (which t0@19 would give). The cap is the
    // documented approximation and must bite deterministically.
    val text = (Seq.fill(20)("t0") ++ Seq("t1", "t2")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val slots = Seq((0, "t0"), (1, "t1"), (2, "t2")).toDF("slot", "term")
    val capped = graft.operators.TextAnalysis.proximityMinSpan(docs, slots, k = 16)
      .as[(Long, Long)].collect().toSeq
    assert(capped == Seq((1L, 6L)))
    val uncapped = graft.operators.TextAnalysis.proximityMinSpan(docs, slots, k = 32)
      .as[(Long, Long)].collect().toSeq
    assert(uncapped == Seq((1L, 2L)))
  }

  test("retrieval closers: empty and degenerate corpora yield empty, not errors") {
    import graft.ops.{EventQueries, TextQueries}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextQueries.phraseSearch(emptyDocs).count() == 0)
    assert(TextQueries.proximitySearch(emptyDocs).count() == 0)
    // docs too short for any trigram: the phrase stage finds no
    // candidate and the search is empty, not a sequence() error
    val shortDocs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    assert(TextQueries.phraseSearch(shortDocs).count() == 0)
    val emptyEvents = Seq.empty[(String, java.sql.Timestamp)]
      .toDF("event_type", "ts")
    assert(EventQueries.seasonalBacktest(emptyEvents).count() == 0)
    // a single day has no lag origins: zero scored days, no rows
    val oneDay = Seq(("a", java.sql.Timestamp.valueOf("2024-03-01 10:00:00")))
      .toDF("event_type", "ts")
    assert(EventQueries.seasonalBacktest(oneDay).count() == 0)
  }
}
