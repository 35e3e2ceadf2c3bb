package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every declared query has an oracle or documented rows-only status") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only checks are allowed only for non-SQL-expressible operators
    // minhash/simhash left this allowlist in r16 (full LSH replays);
    // the residual rows-only population is the float ANN/PQ family
    assert(noOracle.forall(n =>
      n.contains("ann") || n.contains("stream") || n.contains("pq")),
      s"queries missing oracle: $noOracle")
  }

  test("q01 pricing summary: 6 groups, expected columns") {
    val df = Relational.q01PricingSummary(spark, sf)
    assert(df.columns.toSet == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "count_order", "avg_qty", "avg_price"))
    assert(df.count() == 6)
  }

  test("q02 filter/projection pushdown reaches the parquet scan") {
    val df = Relational.q02FilterProject(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThan(l_discount") || plan.contains("l_discount")),
      s"expected pushed filters in:\n$plan")
  }

  test("q03 join chain broadcasts the small filtered dimension") {
    val plan = Relational.q03JoinTopRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q05 pivot emits explicit A/N/R columns without a distinct job") {
    val df = Relational.q05Pivot(spark, sf)
    assert(df.columns.toSet == Set("l_linestatus", "A", "N", "R"))
    assert(df.count() == 2)
  }

  test("q06 unpivot doubles the part rowcount") {
    val parts = Tables.part(spark, sf).count()
    assert(Relational.q06Unpivot(spark, sf).count() == 2 * parts)
  }

  test("q07 rank caps at 3 per nation") {
    import spark.implicits._
    val over = Relational.q07WindowRank(spark, sf)
      .groupBy($"c_nationkey").count().filter($"count" > 3).count()
    assert(over == 0)
  }

  test("q08 topk is a TakeOrderedAndProject, not a global sort") {
    val plan = Relational.q08TopK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(Relational.q08TopK(spark, sf).count() == 10)
  }

  test("q12 union row count = customers + suppliers") {
    val c = Tables.customer(spark, sf).count()
    val s = Tables.supplier(spark, sf).count()
    assert(Relational.q12Union(spark, sf).count() == c + s)
  }

  test("q13 json extraction yields non-null k for every event") {
    import spark.implicits._
    val df = Relational.q13Json(spark, sf)
    assert(df.filter($"k_val".isNull).count() == 0)
  }

  test("approx percentile tracks exact median within sketch error (the 100TB swap)") {
    import org.apache.spark.sql.functions._
    val df = Tables.customer(spark, sf)
      .agg(
        median(col("c_acctbal").cast("double")).as("exact"),
        percentile_approx(col("c_acctbal").cast("double"), lit(0.5), lit(10000)).as("approx"))
      .first()
    val (ex, ap) = (df.getDouble(0), df.getDouble(1))
    assert(math.abs(ex - ap) <= math.abs(ex) * 0.05 + 1.0,
      s"approx median $ap drifted from exact $ex")
  }

  test("all queries execute at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("q108 semantics: mode tie breaks low, discrete median is an actual data value") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group A: values 5 and 2 both appear twice (tie -> 2 wins), plus
    // one 9; n=5 so the discrete median is the value at cum >= 3 -> 5.
    // group B: even count, n=4 of (1,1,3,7): cum >= 2 ceil pick -> 1
    // (the SMALLER middle value — discrete, never the 2.0 interp).
    val rows = Seq(
      ("A", 5.0), ("A", 5.0), ("A", 2.0), ("A", 2.0), ("A", 9.0),
      ("B", 1.0), ("B", 1.0), ("B", 3.0), ("B", 7.0))
      .toDF("l_returnflag", "l_quantity")
    val counts = rows.groupBy($"l_returnflag", $"l_quantity".as("qty"))
      .agg(count(lit(1)).as("cnt"))
    val modeW = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy(col("cnt").desc, col("qty").asc)
    val mode = counts.withColumn("rn", row_number().over(modeW))
      .filter($"rn" === 1).select($"l_returnflag", $"qty")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mode == Map("A" -> 2.0, "B" -> 1.0), s"mode tie-break: $mode")
    val byQty = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("qty")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
    val disc = counts
      .withColumn("cum", sum($"cnt").over(byQty))
      .withColumn("n", sum($"cnt").over(whole))
      .filter($"cum" >= expr("(n + 1) div 2"))
      .groupBy($"l_returnflag").agg(min($"qty").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(disc == Map("A" -> 5.0, "B" -> 1.0), s"discrete median: $disc")
  }
}
