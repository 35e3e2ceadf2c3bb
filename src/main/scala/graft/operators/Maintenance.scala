package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-maintenance operators. At ingest scale the dominant pathology
  * is SMALL FILES: a streaming sink or per-batch partition write lands
  * thousands of KB-sized parquet files, and every downstream scan pays
  * per-file open/footer/schedule overhead (a 100k-file table can spend
  * longer listing than reading). Compaction rewrites a directory into
  * ~targetFileBytes files; the sorted variant additionally clusters by
  * the given columns so each output file covers a tight min/max range
  * — parquet row-group statistics then let a filtered scan skip whole
  * files (the poor man's Z-ORDER, and the layout the `PushedFilters`
  * plan checks actually benefit from).
  */
object Maintenance {

  case class CompactStats(filesBefore: Long, filesAfter: Long,
                          bytesBefore: Long, rows: Long)

  /** Rewrite `inDir`'s parquet as ~`targetFileBytes` files at
    * `outDir` (a NEW directory — the caller swaps directories, which
    * is the atomic-publish pattern; compacting in place would race
    * concurrent readers).
    *
    * `sortCols` empty → a shuffle-free coalesce (pure merge).
    * `sortCols` given → range-repartition + in-partition sort, so
    * file min/max ranges are disjoint and filtered scans prune files.
    *
    * Sizing note: output file count is estimated from INPUT bytes;
    * parquet re-encoding usually shrinks the data (bigger row groups,
    * better dictionary/RLE), so real files land at or under target —
    * the safe side of the estimate. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long = 128L << 20,
                     sortCols: Seq[String] = Nil): CompactStats = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val (filesBefore, bytesBefore) = listParquet(spark, inDir)
    val df = spark.read.parquet(inDir)
    val nOut = math.max(1L, (bytesBefore + targetFileBytes - 1) / targetFileBytes).toInt
    val shaped =
      if (sortCols.isEmpty) df.coalesce(nOut)
      else df.repartitionByRange(nOut, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    shaped.write.mode("overwrite").parquet(outDir)
    val (filesAfter, _) = listParquet(spark, outDir)
    CompactStats(filesBefore, filesAfter, bytesBefore,
      spark.read.parquet(outDir).count())
  }

  /** (parquet file count, total bytes) under a directory. */
  private[graft] def listParquet(spark: SparkSession, dir: String): (Long, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(path, true)
    var n = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
    }
    (n, bytes)
  }
}
