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
}
