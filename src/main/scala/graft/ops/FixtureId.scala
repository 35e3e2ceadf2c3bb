package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content identity of the text/vector fixture a pinned oracle row is
  * valid for.
  *
  * The q57–q61 expected values are constants measured on a specific
  * fixture + seed (the LSH side depends on Spark-internal hashing no
  * cross-engine oracle can replay). If `/root/testdata` were ever
  * regenerated, those five oracles would silently compare against
  * stale numbers — so the pinned constants carry the fixture's content
  * hash next to them, a spec asserts it still matches, and RecallProbe
  * prints the current hash + re-pin SQL when it changes.
  *
  * The hash is an order-independent wraparound SUM (mod 2^64) of
  * xxhash64 over every column of `documents` and `embeddings` — one
  * cheap scan per table, no collect of data. SUM rather than bit_xor:
  * xor is blind to even-multiplicity changes (the same row added twice
  * cancels itself out), while a sum moves by n·rowhash for any n ≠ 0.
  * The sum accumulates in decimal(38,0) — Spark's bigint SUM would
  * throw on overflow under ANSI — and wraps to a signed long on the
  * driver.
  */
object FixtureId {

  private val Two64 = BigInt(1) << 64

  def contentHash(spark: SparkSession, dir: String): Long = {
    def h(df: DataFrame): BigInt = BigInt(df
      .agg(coalesce(
        sum(expr("cast(xxhash64(struct(*)) as decimal(38,0))")),
        lit(java.math.BigDecimal.ZERO)))
      .first().getDecimal(0).toBigInteger)
    val s = (h(graft.Tables.documents(spark, dir))
           + h(graft.Tables.embeddings(spark, dir))).mod(Two64)
    (if (s >= Two64 / 2) s - Two64 else s).toLong
  }
}
