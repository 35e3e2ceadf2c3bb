package graft.ops.tb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic TB-shaped data generator (S4, tb_data_collection.py:251-318
  * re-expressed): deterministic incidence curves + hash-derived noise,
  * generated DISTRIBUTED via `spark.range` — no driver-side numpy
  * loop, so the same generator that makes 240 test rows makes 10^9
  * benchmark rows by changing two ints.
  */
object TbSynth {

  private val indicators = Seq("e_inc_num", "e_inc_100k", "e_mort_num", "e_mort_100k")

  /** Long-format facts: nCountries × years × 4 indicators rows. */
  def facts(spark: SparkSession, nCountries: Int,
            startYear: Int = 2018, endYear: Int = 2023): DataFrame = {
    import spark.implicits._
    spark.range(nCountries.toLong)
      .select(
        concat(lit("Country"), format_string("%05d", $"id")).as("country"),
        concat(lit("C"), format_string("%05d", $"id")).as("iso3"),
        when(pmod($"id", lit(2)) === 0, "SEA").otherwise("WPR").as("g_whoregion"),
        $"id".as("cid"))
      .withColumn("year_i", explode(sequence(lit(startYear), lit(endYear))))
      .withColumn("year", $"year_i".cast("string")).drop("year_i")
      .withColumn("indicator", explode(typedLit(indicators)))
      // deterministic base rate per country + mild yearly trend +
      // bounded hash noise: always >= 0, stable across runs/partitions
      .withColumn("value",
        round(
          (pmod(xxhash64($"cid"), lit(100000L)) + lit(1000)).cast("double") *
            (lit(1.0) + (col("year").cast("int") - lit(startYear)) * lit(0.02)) *
            (lit(1.0) + (pmod(xxhash64($"cid", $"year", $"indicator"), lit(100L))
              .cast("double") - 50.0) / 1000.0),
          2))
      .select("country", "iso3", "g_whoregion", "year", "indicator", "value")
  }

  /** Population dimension: one row per (country, year). */
  def population(spark: SparkSession, nCountries: Int,
                 startYear: Int = 2018, endYear: Int = 2023): DataFrame = {
    import spark.implicits._
    spark.range(nCountries.toLong)
      .select(
        concat(lit("Country"), format_string("%05d", $"id")).as("country"),
        concat(lit("C"), format_string("%05d", $"id")).as("iso3"),
        $"id".as("cid"))
      .withColumn("year_i", explode(sequence(lit(startYear), lit(endYear))))
      .withColumn("year", $"year_i".cast("string")).drop("year_i")
      .withColumn("population",
        ((pmod(xxhash64($"cid"), lit(900000000L)) + lit(100000L)).cast("double") *
          (lit(1.0) + (col("year").cast("int") - lit(startYear)) * lit(0.01))))
      .select("country", "iso3", "year", "population")
  }
}
