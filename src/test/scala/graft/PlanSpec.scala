package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guard rails across the whole query registry: the
  * properties that must survive any refactor because they are what
  * makes the plans scale (SURVEY §4.3).
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.executedPlan.toString
    }

  test("no query plan contains a cartesian product") {
    val bad = plans.collect { case (n, p) if p.contains("CartesianProduct") => n }
    assert(bad.isEmpty, s"cartesian products in: $bad")
  }

  test("every parquet-scanning query prunes columns (no full-width lineitem scan)") {
    // lineitem has 11 columns; no query needs more than 6 of them
    val offenders = plans.collect {
      case (n, p) if "ReadSchema: struct<([^>]+)>".r.findAllMatchIn(p)
        .exists(m => m.group(1).split(",").length > 8) => n
    }
    assert(offenders.isEmpty, s"over-wide scans in: $offenders")
  }

  private def formatted(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  test("filter queries push predicates into the scan") {
    Seq("q01_pricing_summary", "q02_filter_project", "q03_join_top_revenue")
      .foreach { q =>
        assert("PushedFilters: \\[[^\\]]*(GreaterThan|LessThan|IsNotNull)".r
          .findFirstIn(formatted(q)).isDefined,
          s"$q lost predicate pushdown")
      }
  }

  test("dimension joins broadcast; nothing falls back to sort-merge at fixture scale") {
    Seq("q03_join_top_revenue", "q04_left_join_agg", "q14_anti_join",
      "q15_semi_join", "q16_latest_date", "q18_join_chain")
      .foreach { q =>
        assert(plans(q).contains("BroadcastHashJoin"), s"$q has no broadcast join")
      }
  }

  test("no registered query runs a global Window over a non-aggregate frame") {
    // The windows-over-aggregates stance (q86/q100/q110/q132) as an
    // enforced audit: an unpartitioned Window must sit over a frame an
    // Aggregate/Limit already collapsed, never over raw scan volume.
    val bad = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      PlanAudit.globalWindowViolations(fn(spark, sf)).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, s"single-task global sorts in:\n${bad.mkString("\n")}")
  }

  test("the global-Window audit catches a deliberately unscalable plan") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // row_number over ALL events with no partition: the canonical
    // stops-scaling-at-100x shape the audit exists to flag
    val bad = Tables.events(spark, sf)
      .withColumn("rk", row_number().over(Window.orderBy(col("ts"))))
    assert(PlanAudit.globalWindowViolations(bad).nonEmpty,
      "audit failed to flag a global window over raw events")
    // and the same window becomes acceptable once the frame is folded
    val folded = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.orderBy(col("n"), col("event_type"))))
    assert(PlanAudit.globalWindowViolations(folded).isEmpty,
      "audit wrongly flagged a window over an aggregate-bounded frame")
    // an aggregate whose collect_list is exploded BACK to raw
    // granularity is raw volume again — Generate revokes boundedness
    val reExploded = Tables.events(spark, sf)
      .groupBy("user_id").agg(collect_list(col("event_id")).as("ids"))
      .select(explode(col("ids")).as("event_id"))
      .withColumn("rk", row_number().over(Window.orderBy(col("event_id"))))
    assert(PlanAudit.globalWindowViolations(reExploded).nonEmpty,
      "audit failed to flag a global window over an explode-reinflated frame")
  }

  test("no registered query cross-joins two unbounded sides; the audit catches one") {
    // the crossJoin stance (every condition-less join rides a
    // broadcast/aggregate-sized frame) as an enforced audit, sharing
    // the Window rule's boundedness walk
    val bad = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      PlanAudit.unboundedCrossViolations(fn(spark, sf)).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, s"unbounded cross shapes in:\n${bad.mkString("\n")}")
    import org.apache.spark.sql.functions._
    val cartesian = Tables.events(spark, sf).select("event_id")
      .crossJoin(Tables.documents(spark, sf).select("doc_id"))
    assert(PlanAudit.unboundedCrossViolations(cartesian).nonEmpty,
      "audit failed to flag a raw-x-raw cartesian")
    val okay = Tables.events(spark, sf)
      .crossJoin(Tables.events(spark, sf).agg(count(lit(1)).as("n_total")))
    assert(PlanAudit.unboundedCrossViolations(okay).isEmpty,
      "audit wrongly flagged a 1-row-aggregate rider")
  }

  test("whole-stage codegen spans exist in aggregation plans") {
    // AQE hides codegen markers until stages materialize: execute first,
    // then the final plan carries the *(n) codegen prefixes
    Seq("q01_pricing_summary", "q11_case_when", "q17_monthly").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // executes THIS plan (count() would build a new one)
      assert(df.queryExecution.executedPlan.toString.contains("*("),
        s"$q has no codegen spans after execution")
    }
  }
}
