package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * A short warmup job runs first so JVM/classloader/codegen startup is
  * not billed to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(
      appName = "graft-bench",
      master = s"local[$cpus]",
      shufflePartitions = Some(cpus.toInt))
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: JVM + parquet reader + codegen paths, not billed below.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try Tables.lineitem(spark, sfDir).limit(1000).count() catch { case _: Throwable => }

    // A failed query must be visible in the output, not just a
    // normal-looking elapsed time: keep the queries map numeric (the
    // driver's contract) and list failures separately.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // ONE bare JSON line on stdout (the driver contract). build.sbt
    // sets `run / outputStrategy := StdoutOutput` so the forked run's
    // stdout passes through verbatim — without it, sbt's logger would
    // prefix the line with "[info] " and break json-parsing consumers.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
