package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * `{"metric":"…","value":N,"unit":"sec","queries":{...},"sf":...}`
  * as the LAST stdout line (build.sbt sets `showSuccess := false` so
  * sbt appends nothing after it).
  *
  * Each query is timed over `SPARK_GRAFT_BENCH_PASSES` passes
  * (default 3) and reports the per-query MINIMUM; the total is the
  * sum of minima. One pass per query is not a measurement on a shared
  * machine: a co-tenant load spike during a single pass inflates that
  * query's number with no way to tell noise from regression (round 3's
  * driver run recorded 3.4x on three queries that a clean replay
  * showed were flat-to-faster; round 6's min-of-2 was load-poisoned on
  * BOTH passes for q36/q48 — 3.47 s / 2.27 s recorded vs 0.90 s /
  * 0.55 s on an idle replay, hence the bump to 3). The min over
  * passes is the standard load-robust estimator of the code's actual
  * cost.
  *
  * Memoized shared legs (graft.ops.Memo) are cleared between passes:
  * within a pass, queries legitimately share work (q57 reuses q40's
  * baseline — the engine's real execution shape); across passes a memo
  * hit would report the cache read, not the query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    val spark = GraftSession.create(
      appName = "graft-bench",
      master = s"local[$cpus]",
      shufflePartitions = Some(cpus.toInt))
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: JVM + parquet reader + codegen paths, not billed below.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try Tables.lineitem(spark, sfDir).limit(1000).count() catch { case _: Throwable => }

    // dev convenience mirroring Verify's: SPARK_GRAFT_ONLY=q136,...
    // times a subset for targeted iteration; unset (the driver) runs all
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    val everOk = scala.collection.mutable.Map.empty[String, Boolean]
    val nFail = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (_ <- 1 to passes) {
      ops.Memo.clear(spark)
      names.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        // A failed query must be visible in the output, not just a
        // normal-looking elapsed time: keep the queries map numeric
        // (the driver's contract) and list failures separately.
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // min over SUCCESSFUL passes only — the first success discards
        // any earlier fast-failure timing (a 0.01s crash must not pose
        // as the query's cost); a query that failed every pass keeps
        // its failing elapsed time so the map stays fully populated.
        val wasOk = everOk.getOrElse(name, false)
        if (ok)
          best(name) = if (wasOk) math.min(best(name), sec) else sec
        else {
          nFail(name) += 1
          if (!wasOk)
            best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
        }
        everOk(name) = wasOk || ok
      }
    }
    // ONE bare JSON line on stdout (the driver contract). build.sbt
    // sets `run / outputStrategy := StdoutOutput` so the forked run's
    // stdout passes through verbatim — without it, sbt's logger would
    // prefix the line with "[info] " and break json-parsing consumers.
    println(summaryJson(names.map(_._1), best, everOk, nFail.toMap, passes, sfDir))
    spark.stop()
  }

  /** The driver-contract summary line, separated from `main` so a spec
    * can pin its shape: valid JSON, all queries present, failures and
    * flaky counts surfaced, and compact enough for the driver's
    * bounded stdout-tail capture (measured: the driver keeps the LAST
    * 2000 chars of stdout — BENCH_r1–r5 tails are exactly 2000 B) —
    * full-precision floats with full query names pushed the line past
    * that buffer and the driver's `parsed` field came back null
    * (r1–r4) even though the line was valid JSON.
    *
    * Per-query keys are the canonical `qNN` ids — the prefix before
    * the first `_` of the registered name, which the driver brief's
    * own contract example uses (`"queries":{"q1":sec,…}`). Full names
    * at 86 queries cost ~1800 chars of keys alone, forcing the
    * precision clamp all the way to whole seconds (worthless for
    * round-over-round comparison); the 4-char ids keep 3-decimal
    * timings with headroom past 150 queries. If ids ever collide the
    * full names come back (defensive — correctness of the mapping
    * beats compactness). */
  def summaryJson(names: Seq[String], best: collection.Map[String, Double],
                  everOk: collection.Map[String, Boolean],
                  nFail: collection.Map[String, Int],
                  passes: Int, sfDir: String): String = {
    val shortIds = names.map(n => n -> n.takeWhile(_ != '_')).toMap
    val id: Map[String, String] =
      if (shortIds.values.toSeq.distinct.size == names.size) shortIds
      else names.map(n => n -> n).toMap
    def build(prec: Int): String = {
      // Two byte-savers, introduced when the registry crossed ~160
      // queries and uniform 2-decimal lines stopped fitting:
      // tiered precision — a value >= 1 s drops one decimal (100 ms
      // is < 10% relative there, while the same byte on a 0.3 s query
      // is the difference between 10 ms and 100 ms resolution) — and
      // trailing-zero stripping ("0.40" → "0.4"), which carries no
      // information at a fixed precision. Together they keep
      // sub-second timings at 10 ms through roughly 180 queries; the
      // uniform clamp ladder below still degrades everything evenly
      // if a slow round blows past that.
      def f(d: Double) = {
        val p = math.max(0, if (d >= 10) prec - 2 else if (d >= 1) prec - 1 else prec)
        val s = s"%.${p}f".formatLocal(java.util.Locale.ROOT, d)
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse
          .stripSuffix(".")
        else s
      }
      val qs = names.map(k => "\"" + id(k) + "\":" + f(best(k)))
        .mkString("{", ",", "}")
      val failed = names.filterNot(everOk.getOrElse(_, false))
        .map("\"" + id(_) + "\"").mkString("[", ",", "]")
      // A query that failed SOME passes but succeeded at least once
      // has a valid min but is hiding instability — surface it as
      // flaky with its failed-pass count, not stderr-only.
      val flaky = names
        .filter(k => everOk.getOrElse(k, false) && nFail.getOrElse(k, 0) > 0)
        .map(k => "\"" + id(k) + "\":" + nFail(k)).mkString("{", ",", "}")
      val total = names.map(best).sum
      // the total always carries 3 decimals — it is the headline number
      // and fits regardless of query count
      // sf records the scale-factor directory's BASENAME — the full
      // path spent 15 B of the tail budget restating /root/testdata
      // on every line
      val sf = new java.io.File(sfDir).getName
      s"""{"metric":"total","value":${"%.3f".formatLocal(java.util.Locale.ROOT, total)},"unit":"sec","queries":$qs,"failed":$failed,"flaky":$flaky,"passes":$passes,"sf":"$sf"}"""
    }
    // self-clamping precision: slow rounds / more queries widen the
    // line; degrade per-query precision before the tail budget breaks.
    // The ceiling is MEASURED, not guessed: the driver stores the last
    // 2000 bytes of stdout verbatim (BENCH_r08.json "tail" is exactly
    // 2000 chars with our line at its end), and build.sbt's
    // showSuccess := false makes this println the final output — so a
    // line under 1980 survives whole with 20 B spare for a trailing
    // newline or a stray shutdown byte.
    Iterator(3, 2, 1, 0).map(build).find(_.length < 1980).getOrElse(build(0))
  }
}
