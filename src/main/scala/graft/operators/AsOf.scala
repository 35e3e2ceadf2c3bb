package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right-side
  * state with `right.time <= left.time` on the same key — the
  * event-stream enrichment operator Spark lacks natively.
  *
  * Built by COMPOSITION (preference (a) before custom plans): tag the
  * two sides, union them, and let a per-key window's
  * `last(value, ignoreNulls)` carry the state forward in time order.
  * Cost = ONE shuffle on the key + a per-key sort — no range-join
  * candidate explosion (a naive `l.ts >= r.ts` join is O(|L|·|R|) per
  * key), which is what makes it hold at 100 TB.
  */
object AsOf {

  /** @param tieBreak extra ordering columns applied among right rows
    *        carrying identical (key, time) — keeps the carried state
    *        deterministic when state updates collide on a timestamp. */
  def asofJoinLast(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   valueCols: Seq[String],
                   tieBreak: Seq[Column] = Nil): DataFrame = {
    val l = left
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_t", col(leftTime))
    val r = right
      .withColumn("__asof_side", lit(0))
      .withColumn("__asof_t", col(rightTime))
      .drop(rightTime)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal time -> the
    // `<=` as-of semantics; ignoreNulls skips the left rows' nulls
    val w = Window.partitionBy(key)
      .orderBy((Seq(col("__asof_t").asc, col("__asof_side").asc) ++
        tieBreak.map(_.asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__asof_side") === 1)
      .drop("__asof_side", "__asof_t")
  }
}
