package graft.ops.tb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source fallback-chain orchestration — the composed try-next-on-
  * failure entry point of the reference's collect phase
  * (`tb_data_collection.py`): WHO TME CSV (:53-126) → GHO API
  * (:128-182) → synthetic generator (:251-318), chained by
  * `fetch_who_tb_estimates`'s exception handler and
  * `_fetch_who_gho_api`'s empty-result branch, driven from
  * `collect_all_data` (:320-350).
  *
  * Each leg here is the existing engine source (explicit-schema CSV /
  * JSONL read, distributed synth generator); this object only adds the
  * chain: a leg FAILS by throwing (missing file, malformed shape) or
  * by landing zero usable rows — both advance to the next leg, exactly
  * the reference's two failure modes. The emptiness probe is a
  * `head(1)` over collection-sized data (a few thousand rows per the
  * reference's own scope), not a dataflow collect.
  */
object TbCollect {

  /** Which leg of the chain produced the data — surfaced so callers /
    * logs can tell a real snapshot from the synthetic fallback. */
  sealed trait Leg { def name: String }
  case object WhoCsv extends Leg { val name = "who_csv" }
  case object GhoApi extends Leg { val name = "gho_api" }
  case object Synthetic extends Leg { val name = "synthetic" }

  /** One JSONL line per GHO `value[]` record, stamped by the fetcher
    * with the indicator code of the per-indicator URL it came from
    * (tb_data_collection.py:146-151 — the API response itself does not
    * repeat the indicator). */
  val ghoSchema: StructType = StructType(Seq(
    StructField("indicator", StringType),
    StructField("SpatialDim", StringType),
    StructField("TimeDim", IntegerType),
    StructField("NumericValue", DoubleType)))

  /** The reference's SEA target countries (tb_data_collection.py:22-29). */
  val targetIso3: Seq[String] =
    Seq("IDN", "PHL", "VNM", "THA", "MYS", "MMR", "KHM", "LAO", "SGP", "TLS")

  /** iso3 → display name (tb_data_collection.py:236-249). */
  private val countryNames = Seq(
    "IDN" -> "Indonesia", "PHL" -> "Philippines", "VNM" -> "Viet Nam",
    "THA" -> "Thailand", "MYS" -> "Malaysia", "MMR" -> "Myanmar",
    "KHM" -> "Cambodia", "LAO" -> "Lao People's Democratic Republic",
    "SGP" -> "Singapore", "TLS" -> "Timor-Leste")

  /** Normalize a landed WHO snapshot to the canonical long schema. The
    * committed snapshot is already long (the reference saves the melted
    * frame); a freshly-downloaded TME CSV is wide — detect by column
    * names only (no data scan) and melt via [[TbIngest.normalizeWide]]. */
  def readWhoSnapshot(spark: SparkSession, path: String,
                      startYear: Int, endYear: Int): DataFrame = {
    // header-only probe: one line of one file, not a data scan
    val header = spark.read.option("header", "true").csv(path).schema.fieldNames.toSeq
    if (header.contains("indicator") && header.contains("value") &&
        header.contains("year"))
      TbPipeline.readTbCsv(spark, path)
        .filter(col("year").cast("int").between(startYear, endYear))
    else
      TbIngest.normalizeWide(
        spark.read.option("header", "true").csv(path), startYear, endYear,
        targetIso3)
  }

  /** Normalize a GHO API JSONL landing to the canonical long schema.
    *
    * Disclosed deviation: the reference stores the raw GHO indicator
    * code (`TB_c_newinc`, tb_data_collection.py:135-141,162) which its
    * own processing whitelist (`spark_data_processor.py:472-479`,
    * un-prefixed names) then silently drops — GHO-sourced rows never
    * reach the products. Stripping the `TB_` prefix here restores the
    * documented intent of the fallback (usable data), while keeping
    * every other observable (country filter, year range, SEA region
    * stamp, name mapping) identical. */
  def readGhoJsonl(spark: SparkSession, path: String,
                   startYear: Int, endYear: Int): DataFrame = {
    import spark.implicits._
    val names = countryNames.toDF("iso3", "country")
    graft.sources.Sources.jsonl(spark, path, ghoSchema)
      .filter(col("SpatialDim").isin(targetIso3: _*) &&
        col("TimeDim").between(startYear, endYear) &&
        col("NumericValue").isNotNull)
      .withColumn("iso3", col("SpatialDim"))
      .join(broadcast(names), Seq("iso3"), "left")
      .select(
        coalesce(col("country"), col("iso3")).as("country"),
        col("iso3"),
        lit("SEA").as("g_whoregion"),
        col("TimeDim").cast("string").as("year"),
        regexp_replace(col("indicator"), "^TB_", "").as("indicator"),
        col("NumericValue").cast("double").as("value"))
  }

  /** The composed chain. Legs are attempted in the reference's order;
    * the first one that lands at least one row wins. The synthetic leg
    * cannot fail, so the chain always returns data — the property
    * `collect_all_data` relies on. */
  def collectTb(spark: SparkSession,
                primaryCsv: Option[String],
                ghoJsonl: Option[String],
                startYear: Int = 2018, endYear: Int = 2023,
                synthCountries: Int = 10): (Leg, DataFrame) = {
    def attempt(leg: Leg, df: => DataFrame): Option[(Leg, DataFrame)] =
      try {
        val d = df
        if (d.head(1).nonEmpty) Some((leg, d)) else None
      } catch {
        case e: Exception =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"collect leg ${leg.name} failed: ${e.getMessage}")
          None
      }
    primaryCsv.flatMap(p => attempt(WhoCsv, readWhoSnapshot(spark, p, startYear, endYear)))
      .orElse(ghoJsonl.flatMap(p => attempt(GhoApi, readGhoJsonl(spark, p, startYear, endYear))))
      .getOrElse((Synthetic, TbSynth.facts(spark, synthCountries, startYear, endYear)))
  }
}
