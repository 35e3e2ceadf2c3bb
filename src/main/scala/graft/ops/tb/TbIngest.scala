package graft.ops.tb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1 dual-shape normalization (tb_data_collection.py:53-126): the WHO
  * CSV arrives either wide-by-indicator (modern TME: a `year` column +
  * one column per indicator) or wide-by-year (legacy: one column per
  * year). Shape detection is pure column-name metadata — no data scan —
  * and both shapes melt to the canonical long schema
  * `[country, iso3, g_whoregion, indicator, year, value]`.
  */
object TbIngest {

  private val preferredIndicators = Seq(
    "e_inc_num", "c_newinc", "e_mort_num", "e_prev_num",
    "e_inc_100k", "e_mort_100k", "e_prev_100k")

  /** Normalize either wide shape to long format. Mirrors the reference's
    * branch conditions exactly: CASE A when a `year` column exists and
    * no column name is all-digits; CASE B melts the digit-named year
    * columns (keeping an `indicator` id column when present). */
  def normalizeWide(raw: DataFrame, startYear: Int = 2018, endYear: Int = 2023,
                    targetIso3: Seq[String] = Nil): DataFrame = {
    val filtered0 =
      if (targetIso3.nonEmpty) raw.filter(col("iso3").isin(targetIso3: _*)) else raw
    val filtered =
      if (filtered0.columns.contains("g_whoregion")) filtered0
      else filtered0.withColumn("g_whoregion", lit("SEA"))
    val cols = filtered.columns.toSeq

    val caseA = cols.contains("year") && !cols.exists(_.forall(_.isDigit))
    val long =
      if (caseA) {
        val idCols = Seq("country", "iso3", "g_whoregion", "year")
        val whitelisted = cols.filter(preferredIndicators.contains)
        val indicatorCols =
          if (whitelisted.nonEmpty) whitelisted
          else cols.filter(c => c.startsWith("e_inc_") || c.startsWith("e_mort_") ||
            c.startsWith("e_prev_") || c == "c_newinc")
        filtered
          .unpivot(idCols.map(col).toArray,
            indicatorCols.map(c => col(c).cast("double").as(c)).toArray,
            "indicator", "value")
          .filter(col("year").cast("int").between(startYear, endYear))
      } else {
        val yearCols = cols.filter(c =>
          c.forall(_.isDigit) && c.toInt >= startYear && c.toInt <= endYear)
        val idCols = Seq("country", "iso3", "g_whoregion") ++
          (if (cols.contains("indicator")) Seq("indicator") else Nil)
        val melted = filtered
          .unpivot(idCols.map(col).toArray,
            yearCols.map(c => col(c).cast("double").as(c)).toArray,
            "year", "value")
        if (cols.contains("indicator")) melted
        else melted.withColumn("indicator", lit("e_inc_num"))
      }

    long
      .withColumn("value", col("value").cast("double"))
      .filter(col("value").isNotNull)
      .withColumn("year", col("year").cast("string"))
      .select("country", "iso3", "g_whoregion", "year", "indicator", "value")
  }
}
