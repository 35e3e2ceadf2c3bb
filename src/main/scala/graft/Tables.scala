package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet fixtures
  * (`/root/testdata/sf*` — see TESTDATA.md / FIXTURES.md §B).
  *
  * Design for scale: every accessor returns the *lazy* parquet scan so
  * Catalyst can push filters and prune columns into the file source.
  * Nothing here caches or collects; callers decide materialization.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as nanos-since-epoch (legacy long mode) and
    * rebuild a microsecond timestamp with exact integer arithmetic.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the
    * session ([[GraftSession.create]] sets it). A reader must not
    * mutate session conf — that's a global side effect that races
    * with concurrent queries — so an unconfigured session fails fast
    * here instead.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "Tables.events needs spark.sql.legacy.parquet.nanosAsLong=true " +
        "(set at session build time, e.g. via GraftSession.create)")
    val raw = load(spark, dir, "events")
    raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
