package graft

import org.apache.spark.sql.SparkSession

import graft.ops.tb.{TbPipeline, TbServing}

/** CLI orchestrator for the TB parity pipeline (SURVEY §7.1 cli/Main,
  * mirroring main_orchestrator.py's collect→process→write phases minus
  * the infra babysitting: one JVM, Spark reads and writes directly).
  *
  * Usage: TbMain <tbCsv> <popCsv> <outDir> [format=parquet|csv]
  */
object TbMain {
  def main(args: Array[String]): Unit = {
    val tbCsv = args.lift(0).getOrElse(
      "/root/reference/data/raw/who_tb_data_20250923_041355.csv")
    val popCsv = args.lift(1).getOrElse(
      "/root/reference/data/raw/worldbank_population_20250923_041355.csv")
    val outDir = args.lift(2).getOrElse("/tmp/tb_out")
    val format = args.lift(3).getOrElse("parquet")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-tb")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val p = TbPipeline.run(spark, tbCsv, popCsv)
    // Products partitioned by year on disk: the serving layer's year
    // point-filters become partition pruning at scale.
    TbPipeline.write(p.countrySummary, s"$outDir/country_summary", format)
    TbPipeline.write(p.yearlyTrends, s"$outDir/yearly_trends", format)
    TbPipeline.write(p.countryTrends, s"$outDir/country_trends", format,
      partitionBy = if (format == "parquet") Seq("year") else Nil)

    println("== country_summary (top 3 by total_cases)")
    p.countrySummary.show(3, truncate = false)
    println("== yearly_trends")
    p.yearlyTrends.show(10, truncate = false)
    println("== map-data 2023 (first 3)")
    TbServing.mapData(p.countrySummary, TbServing.countryCoords(spark), Some(2023))
      .select("iso3", "name", "lat", "lon", "total_cases").show(3)
    println("== quality")
    p.qualityReport.show(truncate = false)
    spark.stop()
  }
}
