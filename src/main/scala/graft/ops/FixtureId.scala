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
  * The hash is an order-independent bit_xor of xxhash64 over every
  * column of `documents` and `embeddings` — one cheap scan per table,
  * no collect of data.
  */
object FixtureId {

  def contentHash(spark: SparkSession, dir: String): Long = {
    def h(df: DataFrame): Long = df
      .agg(coalesce(expr("bit_xor(xxhash64(struct(*)))"), lit(0L)))
      .first().getLong(0)
    h(graft.Tables.documents(spark, dir)) ^ h(graft.Tables.embeddings(spark, dir))
  }
}
