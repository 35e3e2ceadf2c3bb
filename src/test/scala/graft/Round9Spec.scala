package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageCore
import graft.operators.{Dedup, Multimodal}

/** Round-9 contracts for [[Dedup.containmentPairs]]' hot-shingle cap:
  * the no-op property (cap at/above the corpus max df changes
  * nothing), the adversarial boilerplate corpus (the cap removes the
  * f·(f−1)/2 self-join blow-up an f-doc-hot shingle creates), and the
  * capped-universe denominator semantics (a quote diluted by hot
  * boilerplate is FOUND under the cap, because |A∩B|/|A| counts A
  * over the same universe the intersection is measured in). */
class Round9Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** 50 noise docs sharing a 10-word boilerplate header (its 8
    * interior 3-shingles have df=51 — hot under any cap < 51), plus:
    * C = a 14-word unique quote followed by the same boilerplate, and
    * D = 100 unique filler words followed by the quote. The only
    * cross-doc signal besides boilerplate is quote ⊂ D. */
  private lazy val boilerCorpus = {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val quote = (1 to 14).map(i => s"q$i").mkString(" ")
    val filler = (1 to 100).map(i => s"f$i").mkString(" ")
    val noise = (1 to 50).map { d =>
      (100L + d, s"$boiler " + (1 to 12).map(i => s"t${d}_$i").mkString(" "))
    }
    (noise :+ (1L, s"$quote $boiler") :+ (2L, s"$filler $quote"))
      .toDF("doc_id", "text")
  }

  test("containmentPairs cap: at/above max df the cap is a no-op") {
    // open thresholds so the comparison set is non-trivial (every
    // pair sharing any shingle, both directions)
    val uncapped = Dedup.containmentPairs(boilerCorpus, k = 3,
      minPermille = 0L, minShingles = 0L)
      .collect().map(_.toSeq).toSet
    assert(uncapped.nonEmpty)
    // max df in this corpus is 51 (the boilerplate shingles)
    for (cap <- Seq(51, 52, 1000)) {
      val capped = Dedup.containmentPairs(boilerCorpus, k = 3,
        minPermille = 0L, minShingles = 0L,
        maxShingleDocFreq = Some(cap))
        .collect().map(_.toSeq).toSet
      assert(capped == uncapped, s"cap=$cap must be a no-op")
    }
  }

  test("containmentPairs cap: a hot boilerplate shingle no longer fans out f·(f−1)/2 pairs") {
    // uncapped, the 8 df=51 boilerplate shingles join every pair of
    // the 51 docs carrying them: C(51,2) = 1275 undirected pairs,
    // plus quote ⊂ D — 1276 pairs → 2552 directed rows at open
    // thresholds. Under cap=10 the hot shingles leave the index and
    // the ONLY surviving cross-doc shingles are the quote's: 1
    // undirected pair → 2 rows. That is the whole scale story: pair
    // count bounded by the true signal, not by the hottest shingle.
    val open = Dedup.containmentPairs(boilerCorpus, k = 3,
      minPermille = 0L, minShingles = 0L)
    assert(open.count() == 2552L)
    val capped = Dedup.containmentPairs(boilerCorpus, k = 3,
      minPermille = 0L, minShingles = 0L, maxShingleDocFreq = Some(10))
    assert(capped.count() == 2L)
  }

  test("containmentPairs cap: the denominator counts the capped universe, finding boiler-diluted quotes") {
    // With production dials, UNCAPPED misses quote ⊂ D: C's
    // denominator includes the 8 boilerplate shingles D lacks
    // (common=12, ns=22 → 545‰ < 800‰). CAPPED, C's denominator is
    // its 14 surviving shingles (12 quote + 2 quote→boiler boundary)
    // → 857‰ ≥ 800‰ — the hot-shingle exclusion and the denominator
    // adjustment must move together, which is what capAdjust's
    // dropped-row subtract guarantees.
    val uncapped = Dedup.containmentPairs(boilerCorpus, k = 3,
      minPermille = 800L, minShingles = 10L).collect()
    assert(uncapped.isEmpty,
      s"boiler-diluted quote invisible uncapped: ${uncapped.mkString(";")}")
    val capped = Dedup.containmentPairs(boilerCorpus, k = 3,
      minPermille = 800L, minShingles = 10L, maxShingleDocFreq = Some(10))
      .collect()
    assert(capped.length == 1, s"got ${capped.mkString(";")}")
    val r = capped.head
    assert(r.getAs[Long]("contained") == 1L && r.getAs[Long]("container") == 2L)
    assert(r.getAs[Long]("n_contained") == 14L)
    assert(r.getAs[Long]("common") == 12L)
    assert(r.getAs[Long]("cont_permille") == 857L)
  }

  // ---- ingestion guard rails ----

  test("normalizeEventTs fails fast on a non-UTC session zone for NTZ fixtures") {
    // the NTZ->TIMESTAMP cast reinterprets wall-clock in the session
    // zone; silently shifting every event under a misconfigured
    // externally built session is the failure the guard exists for
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val raw = spark.read.parquet(s"${SparkTestSession.sf}/events.parquet")
      if (raw.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampNTZType) {
        val e = intercept[IllegalArgumentException] { Tables.normalizeEventTs(raw) }
        assert(e.getMessage.contains("UTC"))
      }
    } finally spark.conf.set(tzKey, saved)
    // and under the restored UTC zone the same frame normalizes fine
    assert(Tables.events(spark, SparkTestSession.sf).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("rawSchema falls back to the micros shape when the stream path doesn't exist yet") {
    val got = graft.streaming.EventStreams.rawSchema(spark,
      "/tmp/graft_no_such_dir_round9/events.parquet")
    assert(got == graft.streaming.EventStreams.microsEventSchema)
    // and the fallback shape is one normalizeEventTs accepts
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), got)
    assert(Tables.normalizeEventTs(empty).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  // ---- containment gate on the delta-dedup paths ----

  test("deltaDedup containment gate: a quote inside a longer corpus doc is non-novel only under the gate") {
    // corpus doc = 100 unique filler words + a 14-word quote; delta
    // doc = the quote + a 3-word unique tail. Not an exact dup, and
    // Jaccard ~15/114 is far below any sane threshold (the container
    // dominates the union) — yet ~15/17 of the delta doc's shingles
    // live in the corpus doc: exactly the signal the second gate adds.
    val filler = (1 to 100).map(i => s"f$i").mkString(" ")
    val quote = (1 to 14).map(i => s"q$i").mkString(" ")
    val corpus = Seq((1L, s"$filler $quote")).toDF("doc_id", "text")
    val delta = Seq((2L, s"$quote t1 t2 t3")).toDF("doc_id", "text")
    val jaccardOnly = Dedup.deltaDedup(corpus, delta, releaseEagerly = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(jaccardOnly == Set(2L), "Jaccard alone must NOT see the quote")
    val gated = Dedup.deltaDedup(corpus, delta, releaseEagerly = false,
        containmentPermille = Some(800L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated.isEmpty, "containment >= 800 permille must drop the quoted delta doc")
    // a genuinely novel doc passes BOTH gates
    val novel = Seq((3L, (1 to 30).map(i => s"n$i").mkString(" "))).toDF("doc_id", "text")
    val kept = Dedup.deltaDedup(corpus, novel, releaseEagerly = false,
        containmentPermille = Some(800L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("deltaDedupIndexed equals deltaDedup with the containment gate on (fixture split, biting dial)") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    // the q135 dial: measured (DuckDB sweep) as the largest permille
    // that changes the novel set at fixture scale
    val direct = Dedup.deltaDedup(corpus, delta,
        containmentPermille = Some(250L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val indexed = Dedup.deltaDedupIndexed(
        Dedup.buildDedupIndex(corpus), delta,
        containmentPermille = Some(250L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed == direct,
      s"missing=${(direct -- indexed).take(5)} extra=${(indexed -- direct).take(5)}")
  }

  test("containment gate composes with the hot-shingle cap: denominator reads the capped universe") {
    // boiler corpus, delta = C (quote+boilerplate), corpus = D
    // (filler+quote) + the 50 boilerplate noise docs. Uncapped, C's
    // containment in D is 12/22 = 545 permille (< 800: the hot
    // boilerplate dilutes C's denominator) and C-vs-noise is the
    // boilerplate shingles only (~9/22 = 409 permille) — C wrongly
    // survives. Under cap=10 the df=51 boilerplate shingles leave
    // BOTH the index and C's denominator (quote shingles at df=2
    // stay): 12/14 = 857 permille >= 800 — the quote is caught. Same
    // arithmetic Round9's containmentPairs case pins, now on the
    // delta path through the shared dupDeltaIds gate.
    val corpus = boilerCorpus.filter(col("doc_id") =!= 1L)
    val delta = boilerCorpus.filter(col("doc_id") === 1L)
    val uncapped = Dedup.deltaDedup(corpus, delta, releaseEagerly = false,
        containmentPermille = Some(800L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(uncapped == Set(1L), "boiler-diluted quote invisible uncapped")
    val capped = Dedup.deltaDedup(corpus, delta, releaseEagerly = false,
        maxShingleDocFreq = Some(10), containmentPermille = Some(800L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capped.isEmpty, "capped-universe denominator must surface the quote")
  }

  // ---- real image codecs (javax.imageio) ----

  /** Encode a pixel function as real codec bytes. Gray pixels set
    * R=G=B=g so Rec.601 luminance is exactly g (weights sum to 1000). */
  private def imageBytes(w: Int, h: Int, fmt: String)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = px(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def assetsOf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("asset_id", "payload")

  test("decodeImage: real PNG/BMP/JPEG dims + channels; corrupt bytes quarantine as null") {
    val rows = Seq(
      1L -> imageBytes(64, 48, "png")((x, y) => (x * 7 + y * 5) % 256),
      2L -> imageBytes(32, 32, "bmp")((x, y) => (x + y) % 256),
      3L -> imageBytes(17, 9, "jpg")((x, y) => (x * 13) % 256),
      4L -> "not an image at all".getBytes("UTF-8"))
    val out = Multimodal.decodeImage(assetsOf(rows))
      .select("asset_id", "width", "height", "channels")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == ((Some(64), Some(48), Some(3))))
    assert(out(2L) == ((Some(32), Some(32), Some(3))))
    assert(out(3L) == ((Some(17), Some(9), Some(3))))
    assert(out(4L) == ((None, None, None)), "corrupt payload must yield null, not fail")
  }

  test("ahash64 on a real PNG matches the hand-computed block threshold") {
    // 8x8 image = one pixel per hash cell; left half gray 0, right
    // half gray 200 → total 6400, threshold v*64 >= total → exactly
    // the right-half bits (cols 4..7 of every row)
    val bytes = imageBytes(8, 8, "png")((x, _) => if (x < 4) 0 else 200)
    var want = 0L
    for (r <- 0 until 8; c <- 4 until 8) want |= 1L << (r * 8 + c)
    // repartition keeps ConvertToLocalRelation from folding the whole
    // projection at optimize time (which would bypass codegen — and,
    // incidentally, prove interpreted eval): the hash must run in a
    // generated stage here
    val hashed = Multimodal.imageHashes(assetsOf(Seq(1L -> bytes)).repartition(1))
    val got = hashed.collect().head.getAs[Long]("ahash")
    assert(got == want, f"ahash got $got%016x want $want%016x")
    // the binary-hash expressions implement doGenCode, so the hash
    // projection stays inside whole-stage codegen — read the FINAL
    // AQE plan (post-collect), where the `*(n)` codegen markers are
    // materialized. (The q134 grid variant sits under a HOF
    // `transform`, which Spark itself keeps out of codegen — the
    // decode path here is the hot one.)
    assert(hashed.queryExecution.executedPlan.toString.contains("*("),
      s"image-hash projection fell out of whole-stage codegen:\n" +
        hashed.queryExecution.executedPlan.toString)
  }

  test("dhash64: monotone columns set all 64 gradient bits; PNG and BMP encodings agree") {
    // 9x8 image, one pixel per dHash cell, strictly increasing by
    // column → every right-neighbor comparison true → all bits set
    val png = imageBytes(9, 8, "png")((x, _) => x * 10)
    val bmp = imageBytes(9, 8, "bmp")((x, _) => x * 10)
    val got = Multimodal.imageHashes(assetsOf(Seq(1L -> png, 2L -> bmp)))
      .select("asset_id", "dhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == -1L, f"all-ones dhash expected, got ${got(1L)}%016x")
    assert(got(1L) == got(2L), "lossless codecs must hash identically")
  }

  test("imageNearDupPairs finds the planted 1-bit pair and rejects the far image") {
    // 64x64 images over an 8x8 block grid: A = checkerboard of 0/200
    // blocks, B = A with ONE block flipped 0→200 (hamming 1), C = the
    // inverted checkerboard (hamming ~62). Block value = pixel value
    // across the whole 8x8 block, so block means are exact.
    def checker(flip: Boolean, invert: Boolean) =
      imageBytes(64, 64, "png") { (x, y) =>
        val (bc, br) = (x / 8, y / 8)
        val on = ((bc + br) % 2 == 0) ^ invert
        if (flip && bc == 1 && br == 0) 200 // an OFF block in A
        else if (on) 200 else 0
      }
    val assets = assetsOf(Seq(
      1L -> checker(flip = false, invert = false),
      2L -> checker(flip = true, invert = false),
      3L -> checker(flip = false, invert = true)))
    val pairs = Multimodal.imageNearDupPairs(assets, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1)),
      s"exactly the planted pair at hamming 1: ${pairs.mkString(";")}")
    // the recall-proof guard: bands must exceed the hamming budget
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(assets, maxHamming = 4, bands = 4)
    }
  }

  test("grayGrid handles images smaller than the hash grid") {
    // 3x2 image: blocks repeat edge pixels; decode + hash must not
    // crash and must be deterministic
    val tiny = imageBytes(3, 2, "png")((x, y) => x * 50 + y * 20)
    val out = Multimodal.imageHashes(assetsOf(Seq(1L -> tiny)))
      .select("ahash", "dhash").collect().head
    val again = Multimodal.imageHashes(assetsOf(Seq(1L -> tiny)))
      .select("ahash", "dhash").collect().head
    assert(out == again)
  }

  test("q136's mixed cluster grids separate: every near-dup pair is intra-cluster") {
    // the affine-grid failure mode this pins: base patterns that are
    // arithmetic progressions mod 256 collapse distinct clusters onto
    // near-identical hashes, flooding the pair set with cross-cluster
    // "near-dups" that aren't planted structure
    val pairs = graft.ops.EventQueries.q136ImageNearDup(spark, SparkTestSession.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "the planted intra-cluster pairs must be found")
    val cross = pairs.filter { case (a, b) => a / 16 != b / 16 }
    assert(cross.isEmpty, s"cross-cluster collisions: ${cross.take(5).mkString(";")}")
  }

  test("hashNearDupPairs: slice-pair keys (keyBands=2) return exactly the single-slice pair set") {
    // the corpus-size dial must change candidate volume only, never
    // the answer — pigeonhole holds at bands − maxHamming ≥ 2
    graft.functions.AHash64Gray.register(spark)
    val grid = graft.ops.EventQueries.clusterGridSql(
      "pmod(doc_id, 32)", "pmod(doc_id div 32, 64)")
    val hashed = Tables.documents(spark, SparkTestSession.sf).select(
      col("doc_id").as("asset_id"), expr(s"ahash64_gray($grid)").as("ahash"))
    def pairs(kb: Int) = Multimodal.hashNearDupPairs(hashed,
        maxHamming = 4, bands = 8, keyBands = kb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val single = pairs(1)
    assert(single.nonEmpty)
    assert(pairs(2) == single)
  }

  test("q134 gray-hash arithmetic matches ImageCore on the fixture formula") {
    val df = graft.ops.EventQueries.q134ImageHash(spark, SparkTestSession.sf)
    val row = df.filter(col("doc_id") === 1L).collect().head
    def cells(n: Int) = Array.tabulate(n)(i =>
      java.lang.Math.floorMod(1L * 2654435761L + i.toLong * 40503L, 256L))
    assert(row.getAs[Long]("ahash") == ImageCore.aHashFromCells(cells(64)))
    assert(row.getAs[Long]("dhash") == ImageCore.dHashFromCells(cells(72)))
  }
}
