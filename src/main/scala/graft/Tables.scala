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
  /** `events.ts` has shipped in two physical shapes across fixture
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader only admits as nanos-since-epoch LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true` ([[GraftSession.create]]
    * sets it) — and plain TIMESTAMP(MICROS), which loads directly as
    * TimestampType. Branch on the type the scan actually reports so
    * either generation yields the same microsecond-timestamp column;
    * anything else fails loudly rather than silently misinterpreting
    * epoch units.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(spark, dir, "events"))

  /** Rebuild `ts` as a microsecond timestamp whatever physical shape it
    * arrived in (shared with the streaming reader, which must pass an
    * explicit schema and so meets the same two shapes). */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: exact integer nanos → micros
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case TimestampNTZType =>
        // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) infers as NTZ
        // (spark.sql.parquet.inferTimestampNTZ.enabled defaults true);
        // the engine standardizes on TimestampType under a UTC session
        // zone, so this cast is wall-clock-exact and keeps watermarks,
        // interval arithmetic, and the DuckDB oracle identical across
        // fixture generations. The NTZ→TIMESTAMP cast reinterprets
        // wall-clock in the SESSION zone, so on an externally built
        // session (registerFunctions supports those) a non-UTC zone
        // would silently shift every timestamp — fail fast instead,
        // mirroring the nanos-generation guard this branch replaced.
        val tz = raw.sparkSession.conf.get("spark.sql.session.timeZone")
        val utc = try {
          java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS).getRules
            .getOffset(java.time.Instant.EPOCH) == java.time.ZoneOffset.UTC &&
            java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS).getRules.isFixedOffset
        } catch { case _: java.time.DateTimeException => false }
        require(utc, s"events.ts is TIMESTAMP_NTZ: the NTZ->TIMESTAMP cast is " +
          s"wall-clock-exact only under a UTC session zone; " +
          s"spark.sql.session.timeZone is '$tz'. Set it to UTC (GraftSession does).")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: expected LongType (nanos-as-long), TimestampType, or TimestampNTZType, got $other")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
