package graft.ops.tb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity TB analytics pipeline (SURVEY.md §2/§3).
  *
  * Re-expresses the reference's ETL (clean → pivot → join → derive →
  * aggregate; `/root/reference/spark_data_processor.py:419-629`) as a
  * library of pure DataFrame→DataFrame functions. The pandas
  * pre-cleaning layer of the reference collapses into column
  * expressions on read (SURVEY §1.4) — one engine, one pass.
  *
  * Scale posture: no `collect` in the dataflow (the reference's
  * driver-side `max(year)` scalar becomes a broadcast join), the
  * population dimension join stays broadcast-able, and every derived
  * column is a built-in Catalyst expression (codegen'd, pushdown-safe).
  * The only intentionally-preserved driver probe is the 5-row
  * swapped-column heuristic, constant work at any scale.
  */
object TbPipeline {

  /** TB fact schema — year enters as STRING (spark_data_processor.py:396-403). */
  val tbSchema: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("iso3", StringType),
    StructField("g_whoregion", StringType),
    StructField("year", StringType),
    StructField("indicator", StringType),
    StructField("value", DoubleType)))

  /** Population schema; file carries doubles ("281190067.0") — read as
    * double, cast to long in [[cleanPopulation]] (the reference does the
    * float→int coercion in pandas, spark_data_processor.py:354). */
  val popSchema: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("iso3", StringType),
    StructField("year", StringType),
    StructField("population", DoubleType)))

  /** Indicator whitelist (spark_data_processor.py:472-479). */
  val validIndicators: Seq[String] = Seq(
    "e_inc_num", "c_newinc", "e_mort_num", "e_prev_num",
    "e_inc_100k", "e_mort_100k", "e_prev_100k", "c_newinc_100k")

  private val pivotRenames = Seq(
    "e_inc_num" -> "total_cases", "c_newinc" -> "new_cases",
    "e_mort_num" -> "deaths", "e_prev_num" -> "prevalence")

  // ------------------------------------------------------------- sources

  def readTbCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(tbSchema).csv(path)

  def readPopulationCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(popSchema).csv(path)

  /** Wide→long melt for the collector's two wide CSV shapes
    * (tb_data_collection.py:92-95,111-114 → `Dataset.unpivot`). */
  def meltWide(df: DataFrame, idCols: Seq[String], valueCols: Seq[String]): DataFrame =
    df.unpivot(idCols.map(col).toArray,
      valueCols.map(c => col(c).cast("double").as(c)).toArray,
      "indicator", "value")

  // ------------------------------------------------------------- cleaning

  /** P1–P3 + P6 + P7: validity filter, swap repair, year cast+range,
    * indicator whitelist (spark_data_processor.py:419-490). */
  def cleanTb(df: DataFrame): DataFrame = {
    val base = df.filter(
      col("value").isNotNull && col("value") >= 0 &&
      col("year").isNotNull && col("iso3").isNotNull &&
      col("indicator").isNotNull)
    // Swapped year/indicator heuristic: 5-row driver probe, constant
    // work (spark_data_processor.py:437-451) — observable behavior, kept.
    val sample = base.select("year").limit(5).collect()
    val swapped = sample.exists(r => Option(r.getString(0)).exists(_.contains("e_")))
    val repaired = if (swapped)
      base.select(col("country"), col("iso3"), col("g_whoregion"),
        col("indicator").as("year"), col("year").as("indicator"), col("value"))
    else base
    repaired
      .withColumn("year", col("year").cast(IntegerType))
      .filter(col("year").isNotNull && col("year") >= 2000 && col("year") <= 2030)
      .filter(col("indicator").isin(validIndicators: _*))
  }

  /** P4 + P7 + P8: population validity, year cast, Laos name
    * standardization — population side ONLY; the TB side keeps the long
    * form name, which is why it survives into country_summary
    * (spark_data_processor.py:492-514, golden country_summary.csv:9). */
  def cleanPopulation(df: DataFrame): DataFrame =
    df.filter(
        col("population").isNotNull && col("population") > 0 &&
        col("year").isNotNull && col("iso3").isNotNull)
      .withColumn("population", col("population").cast(LongType))
      .withColumn("year", col("year").cast(IntegerType))
      .withColumn("country",
        when(col("country") === "Lao People's Democratic Republic", "Laos")
          .when(col("country") === "Lao PDR", "Laos")
          .otherwise(col("country")))

  // ------------------------------------------------------------- reshape

  /** R1: pivot long→wide with the EXPLICIT full whitelist — a
    * plan-time constant, so unlike the reference's dynamic pivot
    * (spark_data_processor.py:518-546) NO job runs before the pivot:
    * the schema is deterministic and the distinct-scan the reference
    * pays (and the distinct-collect an earlier version of this method
    * paid) is gone. Indicators absent from the snapshot surface as
    * all-null columns and land as 0 via `na.fill` — the same values
    * the reference's explicit lit(0) backfill produces (the raw
    * snapshot lacks c_newinc/e_prev_num, so new_cases/prevalence are 0
    * everywhere in the goldens; golden comparison is numeric, SURVEY
    * §7.4-4). Downstream products select explicit columns, so the
    * extra always-0 *_100k columns never reach an output surface.
    *
    * `first(value)` is deterministic here because (country,iso3,year,
    * indicator) is unique post-cleaning — asserted in the test suite. */
  def pivotIndicators(clean: DataFrame): DataFrame = {
    val pivoted = clean.groupBy("country", "iso3", "year")
      .pivot("indicator", validIndicators)
      .agg(first("value"))
      .na.fill(0)
    pivotRenames.foldLeft(pivoted) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
  }

  // ------------------------------------------------------------- enrich

  /** J1: left equi-join on (iso3, year) + population null-fill
    * (spark_data_processor.py:548-561). The dimension side is tiny →
    * Catalyst picks BroadcastHashJoin under default thresholds; at
    * 100 TB with a huge dimension it degrades gracefully to
    * sort-merge on the composite key. */
  def joinPopulation(pivoted: DataFrame, popClean: DataFrame): DataFrame =
    pivoted
      .join(popClean.select("iso3", "year", "population"), Seq("iso3", "year"), "left")
      .na.fill(Map("population" -> 0))

  /** F1: guarded per-100k / percentage rates as Decimal casts — double
    * arithmetic then cast(DecimalType) = HALF_UP, byte-matching the
    * goldens (spark_data_processor.py:563-592). */
  def deriveRates(combined: DataFrame): DataFrame = {
    def per100k(n: String) =
      when(col("population") > 0,
        (col(n) * 100000 / col("population")).cast(DecimalType(10, 2)))
        .otherwise(0)
    def pctOfCases(n: String) =
      when(col("total_cases") > 0,
        (col(n) * 100 / col("total_cases")).cast(DecimalType(5, 2)))
        .otherwise(0)
    combined
      .withColumn("total_cases_per_100k", per100k("total_cases"))
      .withColumn("new_cases_per_100k", per100k("new_cases"))
      .withColumn("deaths_per_100k", per100k("deaths"))
      .withColumn("case_fatality_rate", pctOfCases("deaths"))
      .withColumn("new_case_rate", pctOfCases("new_cases"))
  }

  // ------------------------------------------------------------- products

  /** A1+P5+P11+O1: latest-year country summary, sorted. The reference
    * collects max(year) to the driver (spark_data_processor.py:601);
    * here a 1-row aggregate is broadcast-joined back — same result, no
    * driver round-trip, scale-safe (SURVEY §7.4-7). */
  def countrySummary(rated: DataFrame): DataFrame = {
    val latest = rated.agg(max("year").as("latest_year"))
    rated.join(broadcast(latest), col("year") === col("latest_year"))
      .select("country", "iso3", "year",
        "total_cases", "new_cases", "deaths", "prevalence", "population",
        "total_cases_per_100k", "new_cases_per_100k", "deaths_per_100k",
        "case_fatality_rate", "new_case_rate")
      .orderBy(desc("total_cases"))
  }

  /** A2+O2: regional yearly trends. SEMANTIC TRAP preserved: avg_* are
    * the UNWEIGHTED means of per-country rates, not region_cases/
    * region_pop (spark_data_processor.py:612-620, SURVEY §7.4-2). */
  def yearlyTrends(rated: DataFrame): DataFrame =
    rated.groupBy("year")
      .agg(
        sum("total_cases").as("total_cases_region"),
        sum("new_cases").as("new_cases_region"),
        sum("deaths").as("deaths_region"),
        sum("population").as("total_population"),
        avg("total_cases_per_100k").as("avg_cases_per_100k"),
        avg("case_fatality_rate").as("avg_case_fatality_rate"))
      .orderBy("year")

  /** O2/P11: per-country time series (spark_data_processor.py:623-627). */
  def countryTrends(rated: DataFrame): DataFrame =
    rated.select("country", "iso3", "year",
        "total_cases", "new_cases", "deaths",
        "total_cases_per_100k", "new_cases_per_100k", "deaths_per_100k")
      .orderBy("iso3", "year")

  /** W1+A9: serving-view analytics the reference materializes in SQL
    * (init_db.sql:96-126): global rank by cases and by per-100k over the
    * latest year, plus the per-year regional median. Unpartitioned
    * windows are fine here: input is the already-aggregated summary
    * (≤ countries rows), never the fact table. */
  def latestCountryStats(summary: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    summary
      .withColumn("cases_rank",
        rank().over(Window.orderBy(desc("total_cases"))))
      .withColumn("rate_rank",
        rank().over(Window.orderBy(desc("total_cases_per_100k"))))
  }

  /** A9: PERCENTILE_CONT(0.5) equivalent — exact interpolating median
    * (init_db.sql:109-122). */
  def regionalYearlyMedian(rated: DataFrame): DataFrame =
    rated.groupBy("year")
      .agg(
        sum("total_cases").as("region_cases"),
        avg("total_cases_per_100k").as("avg_rate"),
        median(col("total_cases_per_100k").cast("double")).as("median_rate"),
        countDistinct("iso3").as("n_countries"))
      .orderBy("year")

  /** A3–A6 quality report, folded into ONE aggregation job instead of
    * the reference's five separate actions (spark_data_processor.py:726-754). */
  def qualityReport(rated: DataFrame): DataFrame =
    rated.agg(
      count(lit(1)).as("total_records"),
      countDistinct("iso3").as("countries_count"),
      min("year").as("year_min"),
      max("year").as("year_max"),
      sum(when(col("population") <= 0, 1L).otherwise(0L)).as("zero_population_records"),
      sum(when(col("total_cases") <= 0, 1L).otherwise(0L)).as("zero_cases_records"))

  // ------------------------------------------------------------- end-to-end

  /** Full pipeline from raw CSVs to the three products
    * (process_complete_pipeline, spark_data_processor.py:756-795).
    * Lazy end-to-end: one cache point at the rated cut, products share
    * the lineage (vs the reference's ~10 eager jobs, SURVEY §7.4-6). */
  def run(spark: SparkSession, tbCsv: String, popCsv: String): TbProducts =
    runFrames(readTbCsv(spark, tbCsv), readPopulationCsv(spark, popCsv))

  /** Same pipeline from already-landed frames — the entry point the
    * collect fallback chain ([[TbCollect]]) feeds, since its non-CSV
    * legs (GHO JSONL, synthetic) never touch a CSV file. */
  def runFrames(tbLong: DataFrame, popRaw: DataFrame): TbProducts = {
    val rated = deriveRates(
      joinPopulation(
        pivotIndicators(cleanTb(tbLong)),
        cleanPopulation(popRaw))).cache()
    TbProducts(
      countrySummary(rated),
      yearlyTrends(rated),
      countryTrends(rated),
      qualityReport(rated))
  }

  /** Multi-format sinks (S6–S9): csv / parquet / jdbc share one writer. */
  def write(df: DataFrame, path: String, format: String = "parquet",
            partitionBy: Seq[String] = Nil): Unit = {
    val w0 = df.write.mode("overwrite")
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    format match {
      case "csv" => w.option("header", "true").csv(path)
      case "parquet" => w.parquet(path)
      case jdbc if jdbc.startsWith("jdbc:") =>
        // url encoded in `format`, table name in `path` (S9 shape)
        df.write.mode("overwrite").format("jdbc")
          .option("url", jdbc).option("dbtable", path).save()
    }
  }
}

/** The three serving products + quality report (§2.1 S7–S9 payloads). */
final case class TbProducts(
    countrySummary: DataFrame,
    yearlyTrends: DataFrame,
    countryTrends: DataFrame,
    qualityReport: DataFrame)
