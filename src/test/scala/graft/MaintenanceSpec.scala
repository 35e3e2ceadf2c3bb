package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** Compaction contract: fewer files, identical rows, and the sorted
  * variant produces disjoint per-file key ranges (the property that
  * lets parquet min/max stats skip whole files under a filter). */
class MaintenanceSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def shatter(outDir: String): Unit =
    Tables.documents(spark, SparkTestSession.sf)
      .repartition(50) // the small-file pathology: 50 tiny files
      .write.mode("overwrite").parquet(outDir)

  test("compaction merges small files without changing the data") {
    val in = java.nio.file.Files.createTempDirectory("graft_shatter").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    shatter(in)
    val stats = Maintenance.compactParquet(spark, in, out)
    assert(stats.filesBefore == 50)
    assert(stats.filesAfter < stats.filesBefore / 5,
      s"50 tiny files must collapse, got ${stats.filesAfter}")
    assert(stats.rows == Tables.documents(spark, SparkTestSession.sf).count())
    val a = spark.read.parquet(in).collect().map(_.toSeq).toSet
    val b = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("sorted compaction yields disjoint per-file doc_id ranges (file-skipping layout)") {
    val in = java.nio.file.Files.createTempDirectory("graft_shatter2").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    shatter(in)
    // force a multi-file output so disjointness is a real claim
    val stats = Maintenance.compactParquet(spark, in, out,
      targetFileBytes = 16L << 10, sortCols = Seq("doc_id"))
    assert(stats.filesAfter >= 3, s"need several files, got ${stats.filesAfter}")
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // rows survive the rewrite
    assert(stats.rows == Tables.documents(spark, SparkTestSession.sf).count())
  }

  test("morton code interleaves bits (known values)") {
    import org.apache.spark.sql.functions.{col, lit}
    // 0b101 ⨯ 0b011 → a bits at odd positions, b bits at even:
    // a=5 (101), b=3 (011): z = 1_0 0_1 1_1 = 100111₂ = 39
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Maintenance.mortonCode(col("a"), col("b"), 8).as("z"))
      .first().getLong(0)
    assert(z == 39L, s"morton(5,3) must be 39, got $z")
    // identity checks: morton(x,0) spreads x over odd bits; (0,x) even
    val z2 = Seq((255L, 0L)).toDF("a", "b")
      .select(Maintenance.mortonCode(col("a"), col("b"), 8).as("z"))
      .first().getLong(0)
    assert(z2 == 0xAAAAL, s"morton(255,0) must be 0xAAAA, got $z2")
  }

  test("z-order layout prunes files on the trailing dimension; 1-D sort cannot") {
    // events clustered by (user_id, hour): a lexicographic sort on
    // user_id gives each file the FULL hour range (an hour predicate
    // intersects every file); the morton layout tiles both dims, so a
    // large share of files is skippable for the same predicate. This
    // is the whole point of the layout — assert it, don't assume it.
    val ev = Tables.events(spark, SparkTestSession.sf)
      .select(col("event_id"), col("user_id").cast("long").as("u"),
        hour(col("ts")).cast("long").as("h"))
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft_s").toString
    Maintenance.zorderWrite(ev, "u", "h", zDir, nFiles)
    ev.repartitionByRange(nFiles, col("u")).sortWithinPartitions("u")
      .write.mode("overwrite").parquet(sDir)
    // per-file [min,max] of h — what parquet footer stats would serve
    def hRanges(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(min("h").as("lo"), max("h").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // predicate: h in [0, 5] (a quarter of the day)
    def intersecting(rs: Array[(Long, Long)]) =
      rs.count { case (lo, hi) => lo <= 5L && hi >= 0L }
    val zHit = intersecting(hRanges(zDir))
    val sHit = intersecting(hRanges(sDir))
    val zTotal = hRanges(zDir).length
    assert(sHit == hRanges(sDir).length,
      "1-D user sort must NOT prune hour predicates (every file spans all hours)")
    assert(zHit < zTotal / 2,
      s"z-layout must skip over half the files for an hour-quarter box, hit $zHit/$zTotal")
    // the rewrite loses no rows
    assert(spark.read.parquet(zDir).count() == ev.count())
  }

  test("hive-partitioned layout: static filters AND join-driven dynamic pruning reach the scan") {
    // the 100 TB fact-table story: a date-partitioned fact must be
    // prunable BOTH by a literal date predicate (static partition
    // pruning — the planner lists only matching directories) and by a
    // join against a filtered dimension whose matching dates are only
    // known at RUNTIME (dynamic partition pruning — Spark injects the
    // dim's build-side keys as a partition filter). Without DPP a
    // "join to the current release's dates" reads every partition.
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val ev = Tables.events(spark, SparkTestSession.sf)
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    ev.write.partitionBy("day").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val days = fact.select("day").distinct().as[String].collect().sorted
    assert(days.length >= 3, "fixture must span several day partitions")

    // static: a literal day predicate becomes a PartitionFilter, and
    // the scan's partition count drops to 1 (not a post-scan Filter)
    val static = fact.filter($"day" === days.head)
    val scan = static.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    assert(scan.partitionFilters.nonEmpty, "day predicate must be a partition filter")
    assert(static.count() == ev.filter($"day" === days.head).count())

    // dynamic: join fact to a dim filtered on a NON-join column; the
    // qualifying days exist only after the dim is built, so the prune
    // must be a dynamicpruning expression on the fact scan
    // partition-type inference reads `day=2024-…` directories back as
    // DATE — the dim must match, or the cast on the join key blocks
    // the prune from reaching the scan cleanly. The dim must also be a
    // real datasource: on an in-memory LocalRelation the optimizer
    // folds the grp filter away before the PartitionPruning rule looks
    // for a selective predicate, and no DPP is inserted.
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    days.zipWithIndex.map { case (d, i) => (d, i % 2) }
      .toSeq.toDF("day", "grp").withColumn("day", to_date($"day"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter($"grp" === 0), "day")
    val planStr = joined.queryExecution.executedPlan.toString.toLowerCase
    assert(planStr.contains("dynamicpruning"),
      "join-driven date filter must reach the fact scan as dynamic pruning")
    val keepDays = days.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toSet
    assert(joined.count() == ev.filter($"day".isin(keepDays.toSeq: _*)).count())
  }

  test("incrementalRollup == full recompute over applyChanges, on every edge case") {
    // base: groups a (2 rows), b (1 row), c (1 row)
    val base = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "c", 7L)
    ).toDF("k", "g", "v")
    // feed exercises: group emptied (c), value replaced twice (k=1:
    // seq-2 wins), group moved (k=3 b->a), delete of an absent key
    // (k=99), insert creating a NEW group (k=5 -> d), upsert-then-
    // delete (k=2 stays deleted)
    val changes = Seq(
      (4L, 1L, "delete", null.asInstanceOf[String], 0L),
      (1L, 1L, "upsert", "a", 11L),
      (1L, 2L, "upsert", "a", 12L),
      (3L, 1L, "upsert", "a", 5L),
      (99L, 1L, "delete", null.asInstanceOf[String], 0L),
      (5L, 1L, "upsert", "d", 100L),
      (2L, 1L, "upsert", "a", 21L),
      (2L, 2L, "delete", null.asInstanceOf[String], 0L)
    ).toDF("k", "seq", "op", "g", "v")
    val baseRollup = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val inc = Maintenance.incrementalRollup(baseRollup, base, changes,
        key = "k", seqCol = "seq", groupCol = "g", nCol = "n", sumCol = "s")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // expected state: k1=(a,12), k3=(a,5), k5=(d,100); k2/k4 deleted
    assert(inc == Seq(("a", 2L, 17L), ("d", 1L, 100L)))
    // and the general claim: identical to re-aggregating the merged table
    val merged = Maintenance.applyChanges(base, changes,
      key = "k", seqCol = "seq")
    val full = merged.groupBy("g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(inc == full, "incremental maintenance must equal full recompute")
  }

  test("streaming cdcRollupDeltas: base + accumulated deltas == batch incrementalRollup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.RollupChange
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // base state arrives as seq-0 upserts in batch 1 (groups a/b/c),
    // then the edge-case battery lands across batches 2-3 with the
    // low-seq straggler for key 2 in its own batch
    val ms = MemoryStream[RollupChange]
    val q = EventStreams.cdcRollupDeltas(ms.toDS()).writeStream
      .format("memory").queryName("rollup_deltas")
      .outputMode(OutputMode.Append())
      .start()
    try {
      ms.addData(
        RollupChange(1L, 0L, "upsert", "a", 10L),
        RollupChange(2L, 0L, "upsert", "a", 20L),
        RollupChange(3L, 0L, "upsert", "b", 5L),
        RollupChange(4L, 0L, "upsert", "c", 7L))
      q.processAllAvailable()
      ms.addData(
        RollupChange(4L, 1L, "delete", null, 0L),
        RollupChange(1L, 1L, "upsert", "a", 11L),
        RollupChange(1L, 2L, "upsert", "a", 12L), // same-batch fold: net retract(10)+add(12)
        RollupChange(3L, 1L, "upsert", "a", 5L),  // group move b -> a
        RollupChange(5L, 1L, "upsert", "d", 100L),
        RollupChange(2L, 2L, "delete", null, 0L))
      q.processAllAvailable()
      // straggler: lower seq than the delete — no state change, no delta
      ms.addData(RollupChange(2L, 1L, "upsert", "a", 21L))
      q.processAllAvailable()
      val rollup = spark.table("rollup_deltas")
        .groupBy("g").agg(sum($"dn").as("n"), sum($"ds").as("s"))
        .filter($"n" > 0)
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      // same end state as the batch spec above: a = {12, 5}, d = {100}
      assert(rollup == Seq(("a", 2L, 17L), ("d", 1L, 100L)))
    } finally q.stop()
  }

  test("cdcRollupDeltas state survives a query restart from checkpoint") {
    // the recovery contract behind "O(1) state per key FOREVER": the
    // flatMapGroupsWithState store must come back after a stop/start
    // cycle, or run 2's retractions would be computed against empty
    // state and the delta log would silently double-count. The proof
    // is the retraction itself: run 2 emits (-1, -10) for key 1 and
    // (-1, -20) for key 2, values that exist ONLY in run 1's state.
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.RollupChange
    val in = java.nio.file.Files.createTempDirectory("graft_cdc_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cdc_out").toString
    def land(name: String, rows: Seq[RollupChange]): Unit =
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(s"$in/$name")
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(Seq.empty[RollupChange].toDF().schema)
        .option("recursiveFileLookup", "true").parquet(in)
        .as[RollupChange]
        .transform(EventStreams.cdcRollupDeltas)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    land("b1", Seq(RollupChange(1L, 1L, "upsert", "a", 10L),
      RollupChange(2L, 1L, "upsert", "b", 20L)))
    runOnce()
    land("b2", Seq(RollupChange(1L, 2L, "upsert", "a", 15L),
      RollupChange(2L, 2L, "delete", null, 0L)))
    runOnce() // NEW query instance; state must come from the checkpoint
    val byG = spark.read.parquet(out)
      .groupBy("g").agg(sum($"dn").as("n"), sum($"ds").as("s"))
      .as[(String, Long, Long)].collect()
      .map { case (g, n, s) => g -> (n, s) }.toMap
    assert(byG("a") == ((1L, 15L)), s"a: ${byG.get("a")} — retraction of run-1 state missing?")
    assert(byG("b") == ((0L, 0L)), s"b: ${byG.get("b")} — delete must retract run-1 state")
  }
}
