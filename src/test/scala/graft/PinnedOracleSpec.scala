package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{FixtureId, SimilarityQueries, TextQueries}

/** Durability guards for the pinned agreement oracles (q57–q61, q172,
  * q175):
  *
  *  1. Fixture identity — the pinned constants are only valid for the
  *     exact fixture content they were measured on. If /root/testdata
  *     regenerates, this fails loudly with the re-pin instructions
  *     instead of letting the driver gate hash-compare stale numbers.
  *  2. Recall floors — a re-pin after a fixture change pastes whatever
  *     RecallProbe prints, so a compensating pair of changes (fixture +
  *     pin) could silently lock in a recall regression. The floors
  *     bound how far a paste can drift before a human has to look.
  *
  * Floors are deliberately below the current measured values (0.81,
  * 0.68, 0.81, 1.0, 0.8) so ordinary fixture regeneration passes after
  * a re-pin, while a real quality regression (bad dials, broken
  * bucketing) trips them.
  */
class PinnedOracleSpec extends AnyFunSuite {
  import SparkTestSession.spark

  // the pins are measured at sf0.01 (the driver's correctness scale),
  // not the sf0.001 dir the rest of the suite uses
  private val pinDir = "/root/testdata/sf0.01"
  private def fixturePresent: Boolean =
    new java.io.File(s"$pinDir/documents.parquet").exists()

  test("pinned oracle constants match the current fixture content") {
    assume(fixturePresent, s"$pinDir not present in this environment")
    val h = FixtureId.contentHash(spark, pinDir)
    assert(h == SimilarityQueries.PinnedFixtureHash,
      f"fixture content hash 0x$h%016x != pinned 0x${SimilarityQueries.PinnedFixtureHash}%016x — " +
        "testdata regenerated; run `sbt \"runMain graft.RecallProbe /root/testdata/sf0.01\"` " +
        "and paste the printed hash + five oracle rows")
  }

  test("recall floors hold at the production dials (re-pin can't lock in a regression)") {
    assume(fixturePresent, s"$pinDir not present in this environment")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.first().getDouble(3)
    val floors = Seq(
      ("q57 srp ann", recallOf(SimilarityQueries.q57AnnRecall(spark, pinDir)), 0.75),
      // floor raised with the round-7 dial change (64/8 → 128/16 at
      // the same 1/8 probed share, 0.57 → 0.68): a re-pin must not
      // quietly fall back below the recovered headroom
      ("q58 ivf ann", recallOf(SimilarityQueries.q58IvfRecall(spark, pinDir)), 0.60),
      ("q59 embedding near-dup", recallOf(SimilarityQueries.q59NeardupRecall(spark, pinDir)), 0.70),
      ("q60 minhash", recallOf(TextQueries.q60MinhashRecall(spark, pinDir)), 0.90),
      ("q61 simhash", recallOf(TextQueries.q61SimhashAgreement(spark, pinDir)), 0.70),
      // PQ ADC+rerank, measured 0.64 on the random (adversarial)
      // fixture at a ~1/10 shortlist share — floor below it, same
      // margin policy as the rows above
      ("q172 pq adc", recallOf(SimilarityQueries.q172PqRecall(spark, pinDir)), 0.50),
      // IVFADC (r12): measured 0.66 at a 1/4 probed share — the floor
      // additionally encodes the composition's reason to exist: it
      // must not re-pin BELOW the flat-PQ floor while scoring fewer
      // candidates
      ("q175 ivfpq adc", recallOf(SimilarityQueries.q175IvfPqRecall(spark, pinDir)), 0.50),
      // SRP semantic pairs (r16): measured 0.66 at the fixture-tuned
      // 32×6 dials against the exact int8-gated pair set; the
      // identical-gate structure additionally means n_approx ==
      // n_hits, asserted below as its own invariant
      ("q188 srp semantic", recallOf(SimilarityQueries.q188SrpSemanticRecall(spark, pinDir)), 0.50))
    floors.foreach { case (name, recall, floor) =>
      assert(recall >= floor, f"$name recall $recall%.2f below floor $floor%.2f")
    }
  }

  test("q188: zero false positives is structural (both sides share the int8 gate)") {
    assume(fixturePresent, s"$pinDir not present in this environment")
    val r = SimilarityQueries.q188SrpSemanticRecall(spark, pinDir).first()
    assert(r.getLong(1) == r.getLong(2),
      s"SRP emitted ${r.getLong(1)} pairs but only ${r.getLong(2)} are in " +
        "the exact gated set — the gate implementations diverged")
  }
}
