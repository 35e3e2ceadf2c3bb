package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Typed source/sink surface (SURVEY §2.1 S1–S11): every reader takes
  * an EXPLICIT schema — schema inference is a scan of the data you are
  * about to scan, unacceptable at 100 TB and nondeterministic under
  * drift; every writer goes through one function so format policy
  * (compression, mode, partitioning) has a single home.
  */
object Sources {

  /** S1/S5: header CSV with explicit schema. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S2/S3: JSON-lines with explicit schema (the WHO/World-Bank API
    * payload shape: fetch to JSONL outside the engine, read here). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Parquet scan (lazy; filters/pruning push into the footer). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC scan — the other columnar format Spark ships natively; same
    * pushdown/pruning properties as parquet. Write side: `writeFile`
    * with format="orc". */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text-line corpus ingest (one document per line — the common
    * landing shape for web-scrape/training dumps): content-addressed
    * doc ids via xxhash64 of the line. Unlike
    * monotonically_increasing_id / zipWithIndex, the id is a pure
    * function of the content — stable across partitionings, reruns,
    * and cluster sizes (a 100 TB recipe must not renumber when the
    * split layout changes), and exact-duplicate lines get EQUAL ids by
    * construction, which the dedup operators treat as already-collapsed
    * copies. `source` records the originating file for provenance. */
  def textLines(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.text(path)
      .select(
        xxhash64(col("value")).as("doc_id"),
        col("value").as("text"),
        input_file_name().as("source"))
  }

  /** S11: JDBC source. Predicates on the returned frame push down to
    * the database as WHERE clauses (JDBCRelation pushdown). For big
    * tables pass partitioning so the read parallelizes:
    * (partitionColumn, lowerBound, upperBound, numPartitions). */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitioning match {
      case Some((col, lo, hi, n)) =>
        base.option("partitionColumn", col)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", n).load()
      case None => base.load()
    }
  }

  /** S9: JDBC sink (mode overwrite = the reference's if_exists='replace'). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .mode(mode).save()

  /** S6–S8: file sinks with optional partitioning and output-file
    * sizing. `maxRecordsPerFile` caps rows per written file — at scale
    * this is the knob that stops one fat task from emitting a 50 GB
    * file (and, with partitionBy, bounds the largest file of a skewed
    * partition) without a repartition pass. */
  def writeFile(df: DataFrame, path: String, format: String,
                partitionBy: Seq[String] = Nil,
                mode: SaveMode = SaveMode.Overwrite,
                maxRecordsPerFile: Option[Long] = None): Unit = {
    val w0 = df.write.mode(mode)
    val w1 = maxRecordsPerFile.fold(w0)(n => w0.option("maxRecordsPerFile", n))
    val w = if (partitionBy.nonEmpty) w1.partitionBy(partitionBy: _*) else w1
    format match {
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case "parquet" => w.parquet(path)
      case other => w.format(other).save(path)
    }
  }
}
