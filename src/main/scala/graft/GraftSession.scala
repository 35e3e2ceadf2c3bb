package graft

import org.apache.spark.sql.SparkSession

/** Session factory: a SparkSession configured with the engine's
  * defaults and all graft SQL functions registered — the one-call
  * entry point for a library user.
  *
  * Defaults encode the 100 TB posture at local scale: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized to the machine rather than Spark's legacy 200,
  * UTC session time.
  */
object GraftSession {

  def create(appName: String = "graft",
             master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
             shufflePartitions: Option[Int] = None): SparkSession = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS), which vanilla Spark
      // rejects; set once here rather than mutating conf inside readers.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    registerFunctions(spark)
    spark
  }

  /** Register the engine's native SQL functions (idempotent) — also
    * callable on an externally-built session. */
  def registerFunctions(spark: SparkSession): Unit =
    functions.FunctionCatalog.registerAll(spark)
}
