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
  def globalWindowViolations(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
        s"global Window [${w.windowExpressions.map(_.name).mkString(", ")}] " +
          "over a non-aggregate-bounded frame - a single-task sort of raw " +
          "table volume; partition it or fold the frame first"
    }

  // attributes produced by partitioned Windows directly below `p`
  // (looking through adjacent Window/Project stacking only — a
  // selection must sit right on the windows it selects by)
  private def partWinAttrs(p: LogicalPlan)
      : org.apache.spark.sql.catalyst.expressions.AttributeSet = {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    p match {
      case w: Window =>
        (if (w.partitionSpec.nonEmpty)
          AttributeSet(w.windowExpressions.map(_.toAttribute))
        else AttributeSet.empty) ++ partWinAttrs(w.child)
      case pr: Project => partWinAttrs(pr.child)
      case _ => AttributeSet.empty
    }
  }

  /** The boundedness walk both audit rules share — see
    * [[globalWindowViolations]]' scaladoc for the case-by-case
    * rationale. */
  private def bounded(p: LogicalPlan): Boolean = p match {
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

  /** The registry's OTHER standing plan discipline as a checkable
    * rule: every condition-less join (crossJoin / cartesian shape)
    * must have at least one AGGREGATE-BOUNDED side — a 1-row global
    * aggregate riding along, a limit-k frame, a literal grid. Two
    * raw-volume sides under a cross shape is |A|·|B| rows, the plan
    * that stops scaling fastest of all; it's also the shape Spark
    * itself guards with spark.sql.crossJoin semantics, but Catalyst
    * cannot know which side is "semantically tiny" — this rule can,
    * using the same boundedness walk as the Window audit (Aggregate /
    * Limit / literal leaves bound a subtree; joining raw rows back in
    * revokes it). Joins WITH a condition are out of scope here: an
    * inequality-only join (e.g. the q160 pair build) is still
    * nested-loop physically, but its candidate volume is governed by
    * the sides' own boundedness, which the per-query docstrings carry.
    *
    * An EXPLICIT broadcast hint also bounds a side: the walk is
    * structural and cannot see data-dependent smallness (a
    * filter-to-one-row query vector, a memoized aggregate behind an
    * InMemoryRelation leaf), and `broadcast(...)` at the call site is
    * precisely this repo's written assertion that the side is tiny —
    * with the broadcast physically enforcing it (an executor OOMs
    * loudly on a wrongly-hinted big side; a silent cartesian does
    * not). Reported per offending Join node; empty = compliant. */
  def unboundedCrossViolations(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo}
    def hintedBroadcast(h: Option[HintInfo]): Boolean =
      h.exists(_.strategy.contains(BROADCAST))
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty &&
          !(bounded(j.left) || hintedBroadcast(j.hint.leftHint)) &&
          !(bounded(j.right) || hintedBroadcast(j.hint.rightHint)) =>
        "condition-less join with two unbounded, unhinted sides - " +
          "|A|*|B| output on raw volumes; aggregate/limit one side, " +
          "broadcast the tiny one, or add a join key"
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
