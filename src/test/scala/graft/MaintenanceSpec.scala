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
}
