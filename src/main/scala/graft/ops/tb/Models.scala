package graft.ops.tb

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed row models (SURVEY §7.1 model/Schemas): case-class `Encoder`s
  * at module boundaries give compile-time field checks where the
  * schema is fixed; the dynamic-schema stages (pivot output varies
  * with observed indicators) stay `DataFrame`.
  */
final case class TbObservation(
    country: String, iso3: String, g_whoregion: String,
    year: Int, indicator: String, value: Double)

final case class PopulationRow(
    country: String, iso3: String, year: Int, population: Long)

final case class CountryTrend(
    country: String, iso3: String, year: Int,
    total_cases: Double, new_cases: Double, deaths: Double,
    total_cases_per_100k: java.math.BigDecimal,
    new_cases_per_100k: java.math.BigDecimal,
    deaths_per_100k: java.math.BigDecimal)

object Models {
  /** Typed view of the cleaned fact table. */
  def observations(clean: DataFrame): Dataset[TbObservation] = {
    import clean.sparkSession.implicits._
    clean.select("country", "iso3", "g_whoregion", "year", "indicator", "value")
      .as[TbObservation]
  }

  /** Typed view of the cleaned population dimension. */
  def population(clean: DataFrame): Dataset[PopulationRow] = {
    import clean.sparkSession.implicits._
    clean.select("country", "iso3", "year", "population").as[PopulationRow]
  }

  /** Typed view of the country-trends product. */
  def countryTrends(trends: DataFrame): Dataset[CountryTrend] = {
    import trends.sparkSession.implicits._
    trends.selectExpr("country", "iso3", "year",
      "cast(total_cases as double) total_cases",
      "cast(new_cases as double) new_cases",
      "cast(deaths as double) deaths",
      "total_cases_per_100k", "new_cases_per_100k", "deaths_per_100k")
      .as[CountryTrend]
  }
}
