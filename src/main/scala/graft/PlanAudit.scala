package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: one-line physical-plan audit per registered query —
  * scan count, widest ReadSchema, pushed filters, join strategies,
  * codegen spans, cartesian-product alarm. Run after adding or
  * changing queries; plan regressions (lost pushdown, surprise
  * cartesian, broadcast that stopped broadcasting) show up here
  * before they show up in the bench. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(appName = "graft-plan-audit",
      master = "local[4]", shufflePartitions = Some(4))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val scans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toList
        val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan).map(_.group(1)).filter(_.nonEmpty).size
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val cart = if (plan.contains("CartesianProduct")) " CARTESIAN!" else ""
        // Spark 4 marks codegen stages with "*(id)" prefixes
        val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        val widest = scans.map(_.split(",").length).maxOption.getOrElse(0)
        println(f"$name%-22s scans=${scans.size}%2d widest=$widest%2d pushed=$pushed%2d bhj=$bhj smj=$smj bnl=$bnl wsc=$wsc$cart")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
