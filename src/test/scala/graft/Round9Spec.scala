package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

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
}
