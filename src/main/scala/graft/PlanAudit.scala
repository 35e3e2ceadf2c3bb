package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}

/** Dev tool: one-line physical-plan audit per registered query —
  * scan count, widest ReadSchema, pushed filters, join strategies,
  * codegen spans, cartesian-product alarm. Run after adding or
  * changing queries; plan regressions (lost pushdown, surprise
  * cartesian, broadcast that stopped broadcasting) show up here
  * before they show up in the bench. */
object PlanAudit {

  /** The registry's windows-over-aggregates discipline as a CHECKABLE
    * rule, not a convention: an UNPARTITIONED Window is a single-task
    * sort of its entire input, so it is only acceptable over a frame
    * some upstream operator has already collapsed below raw table
    * volume — an Aggregate (group-by / global agg), an explicit
    * Limit, or a literal relation. A global Window directly over
    * scan-cardinality rows is the plan shape that silently stops
    * scaling at 100×, which is exactly when it's hardest to notice.
    *
    * Boundedness walks the optimized logical plan: Aggregate / Limit /
    * literal leaves bound a subtree; semi/anti joins bound iff their
    * LEFT side is bounded (the right side only filters); a Filter
    * keyed on a PARTITIONED window statistic of its own frame bounds
    * it too — that is the two-stage frontier / per-group-selection
    * shape (q110: keep rows matching their partition's max), which
    * collapses cardinality to ~partition count; the partition key's
    * cardinality is then the query docstring's burden, exactly as
    * q110's states (months × frontier width). Any other node is
    * bounded iff every child is (a join or union of bounded frames
    * stays aggregate-sized; joining raw rows back in revokes
    * boundedness, which is the point). Returns one violation string
    * per offending Window node; empty = the plan honors the stance. */
  def globalWindowViolations(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    // attributes produced by partitioned Windows directly below `p`
    // (looking through adjacent Window/Project stacking only — a
    // selection must sit right on the windows it selects by)
    def partWinAttrs(p: LogicalPlan): AttributeSet = p match {
      case w: Window =>
        (if (w.partitionSpec.nonEmpty)
          AttributeSet(w.windowExpressions.map(_.toAttribute))
        else AttributeSet.empty) ++ partWinAttrs(w.child)
      case pr: Project => partWinAttrs(pr.child)
      case _ => AttributeSet.empty
    }
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _: LocalRelation => true
      case _: OneRowRelation => true
      case j: Join if j.joinType == LeftSemi || j.joinType == LeftAnti =>
        bounded(j.left)
      case f: Filter
        if f.condition.references.intersect(partWinAttrs(f.child)).nonEmpty =>
        true
      // row-MULTIPLYING nodes revoke boundedness even over a bounded
      // child: explode of a collect_list over a GROUPED aggregate
      // re-creates raw granularity (one element per original row), so
      // a global Window above it is again a raw-volume sort. The one
      // admitted Generate shape is the explode of a SINGLE-ROW frame
      // (global aggregate / literal) — the dense-calendar generator
      // (q100): its cardinality is generator-sized, disclosed in the
      // query docstring, never proportional to input rows. Expand
      // multiplies by its projection count — revoked outright.
      case g: Generate =>
        def oneRow(p: LogicalPlan): Boolean = p match {
          case a: Aggregate => a.groupingExpressions.isEmpty
          case pr: Project => oneRow(pr.child)
          case f: Filter => oneRow(f.child)
          case _: OneRowRelation => true
          case _: LocalRelation => true
          case _ => false
        }
        oneRow(g.child)
      case _: Expand => false
      case _: LeafNode => false
      case other => other.children.forall(bounded)
    }
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
        s"global Window [${w.windowExpressions.map(_.name).mkString(", ")}] " +
          "over a non-aggregate-bounded frame - a single-task sort of raw " +
          "table volume; partition it or fold the frame first"
    }
  }

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
