package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // an overwritten path invalidates any plan-keyed memo entry built
    // over it, in ANY session (Memo.frameKey's contract) — targeted,
    // so unrelated memoized legs survive
    graft.ops.Memo.invalidatePath(outDir)
    val (filesAfter, _) = listParquet(spark, outDir)
    CompactStats(filesBefore, filesAfter, bytesBefore,
      spark.read.parquet(outDir).count())
  }

  /** Morton (Z-order) code: interleave the low `bits` bits of two
    * non-negative integer columns — bit i of `a` lands at output bit
    * 2i+1, bit i of `b` at 2i. A static 2·bits-term bitwise
    * expression, fully codegen'd, no UDF, and exactly reproducible in
    * any engine with integer shifts (the oracle recomputes it in SQL).
    * Bits of the inputs above `bits` are ignored — normalize first
    * (see [[scaleToBits]]). */
  def mortonCode(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** `x` rescaled from [mn, mx] to [0, 2^bits): ((x−mn)·2^bits) div
    * (mx−mn+1) — integer arithmetic end to end, so the bucketing is
    * exact and engine-portable (a float rescale would put boundary
    * values in different buckets depending on rounding). */
  def scaleToBits(x: Column, mn: Column, mx: Column, bits: Int): Column =
    call_function("div",
      (x.cast("long") - mn.cast("long")) * lit(1L << bits),
      mx.cast("long") - mn.cast("long") + lit(1L))

  /** Z-order clustering: rewrite `df` into `nFiles` parquet files at
    * `outDir`, range-partitioned and sorted by the Morton code of
    * (c1, c2) with each dimension min/max-normalized to `bits` bits.
    *
    * Why not just sort (the [[compactParquet]] sortCols layout)? A
    * lexicographic sort gives tight per-file min/max ranges on the
    * LEADING key only — a predicate on the second column intersects
    * every file and prunes nothing. The interleaved code bounds every
    * file to a small 2-D tile, so parquet footer stats prune files for
    * predicates on EITHER column or a conjunctive box — the standard
    * multi-dimensional layout lever at 100 TB (what table formats call
    * OPTIMIZE ZORDER), here as a plain parquet rewrite.
    *
    * The min/max normalization is one tiny aggregate broadcast to the
    * scan — no driver round-trip, no second pass over the data; the
    * one wide exchange is the range partitioner on the code itself. */
  def zorderWrite(df: DataFrame, c1: String, c2: String, outDir: String,
                  nFiles: Int, bits: Int = 8): Unit = {
    require(nFiles >= 1, s"nFiles must be positive: $nFiles")
    val mm = df.agg(
      min(col(c1)).cast("long").as("_mn1"), max(col(c1)).cast("long").as("_mx1"),
      min(col(c2)).cast("long").as("_mn2"), max(col(c2)).cast("long").as("_mx2"))
    df.crossJoin(broadcast(mm))
      .withColumn("_z", mortonCode(
        scaleToBits(col(c1), col("_mn1"), col("_mx1"), bits),
        scaleToBits(col(c2), col("_mn2"), col("_mx2"), bits), bits))
      .drop("_mn1", "_mx1", "_mn2", "_mx2")
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
    // see compactParquet: overwrite-publish invalidates plan-keyed memos
    graft.ops.Memo.invalidatePath(outDir)
  }

  /** Snapshot diff — dataset-release comparison by id + content
    * fingerprint: one row per id whose membership or content changed
    * between two snapshots (`added` / `removed` / `changed`;
    * unchanged rows are filtered out, so the OUTPUT is proportional
    * to the churn, not the corpus). The workhorse of corpus curation:
    * "what did this crawl refresh actually change", audit trails
    * between training-set releases, and incremental-pipeline inputs
    * (feed the `added`+`changed` ids to the delta-dedup path).
    *
    * Shape at 100 TB: each side reduces to (id, md5 fingerprint) in
    * its scan projection — content bytes never ride the shuffle —
    * then ONE co-partitioned full-outer join on id. Bucketed/
    * co-located layouts make that join exchange-free. Null content
    * columns are sentinel-coalesced before `concat_ws` (which would
    * otherwise SKIP nulls and collapse positionally-different rows
    * onto one fingerprint). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs content columns")
    def fp(df: DataFrame, as: String) = df.select(col(idCol),
      md5(concat_ws("\u0001", contentCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(as))
    fp(oldDf, "fp_old").join(fp(newDf, "fp_new"), Seq(idCol), "full_outer")
      .withColumn("change", expr(
        "CASE WHEN fp_old IS NULL THEN 'added' " +
          "WHEN fp_new IS NULL THEN 'removed' " +
          "WHEN fp_old <> fp_new THEN 'changed' " +
          "ELSE 'unchanged' END"))
      .filter(col("change") =!= "unchanged")
      .select(col(idCol), col("change"))
  }

  /** MERGE INTO / CDC-apply: build the next table version from a base
    * snapshot plus a change feed of upserts and deletes — the write
    * side of the CDC story whose read side is latest-per-key
    * compaction (q95 / `streaming.EventStreams.latestPerKey`), and
    * the operation `MERGE INTO base USING changes` performs in a
    * lakehouse engine.
    *
    * `changes` carries (key, `seqCol`, `opCol` ∈ 'upsert'|'delete',
    * base's payload columns). `seqCol` must TOTALLY order each key's
    * changes (a CDC log's LSN/offset — ties are a contract violation,
    * exactly as an unordered LISTAGG would be): the LAST change wins,
    * an earlier upsert under a later delete stays deleted, and a
    * later upsert resurrects the key.
    *
    * Plan: the per-key latest change is one `seqCol`-desc rank window
    * partitioned on the key; untouched base rows arrive via a
    * left_anti join on the SAME key, so both exchanges co-partition
    * and output is base ∪ latest-upserts with no row ever widened.
    * At 100 TB this is the standard merge shape: shuffle ∝ base +
    * changes, and with both sides bucketed on the key the exchanges
    * vanish entirely. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   seqCol: String, opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    val payload = base.columns.filterNot(_ == key)
    base.join(changes.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(latest.filter(col(opCol) === "upsert")
        .select(key, payload: _*))
  }

  /** Incremental view maintenance for a distributive rollup
    * (count + sum per group): refresh `baseRollup` under a CDC feed
    * WITHOUT re-aggregating the base corpus — the lakehouse
    * "maintain the stats table through the merge" primitive, and the
    * batch form of what a streaming summing-state view maintains
    * continuously.
    *
    * Inputs: `baseRollup` (groupCol, nCol, sumCol) — the prior
    * materialized rollup; `baseRows` (key, groupCol, v) — the prior
    * corpus projected to rollup granularity, probed ONLY for touched
    * keys; `changes` (key, seqCol, opCol, groupCol, v) — the feed,
    * with [[applyChanges]]' contract (seq totally orders each key,
    * last change wins).
    *
    * Algebra (signed deltas — Blakeley et al.'s counting algorithm,
    * SIGMOD 1986, for distributive aggregates): every touched base
    * row RETRACTS (−1, −v) from its group; every winning upsert ADDS
    * (+1, +v); the new rollup is base ⊎ delta with groups whose count
    * reaches 0 dropped. Deletes of absent keys and re-upserts fall
    * out of the algebra — no case analysis.
    *
    * Scale: shuffle ∝ |changes| + |touched base rows| + |groups|.
    * The retraction probe is a key-partitioned LEFT SEMI join of base
    * against the touched-key set — with base bucketed by key it is
    * exchange-free on the base side, and the full-table re-aggregate
    * this replaces never runs. Spec-pinned incremental ≡ recompute on
    * the [[applyChanges]] output; q166's oracle states the same
    * equivalence cross-engine. */
  def incrementalRollup(baseRollup: DataFrame, baseRows: DataFrame,
                        changes: DataFrame, key: String, seqCol: String,
                        groupCol: String, nCol: String, sumCol: String,
                        opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val touched = changes.select(col(key)).distinct()
    val retract = baseRows.join(touched, Seq(key), "left_semi")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("_n"), sum(col("v")).as("_s"))
      .select(col(groupCol), (-col("_n")).as("dn"), (-col("_s")).as("ds"))
    val w = Window.partitionBy(key).orderBy(col(seqCol).desc)
    val adds = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) === "upsert")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("dn"), sum(col("v")).as("ds"))
      .select(col(groupCol), col("dn"), col("ds"))
    val delta = retract.unionByName(adds)
      .groupBy(groupCol)
      .agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    baseRollup.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col(nCol), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as(nCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("ds"), lit(0L)))
          .as(sumCol))
      .filter(col(nCol) > 0)
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
