package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{EventQueries, Relational, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory names to DataFrame builders over a
  * testdata dir; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash-match correctness gate. Keys without an oracle get a
  * weaker rows-only check (non-SQL-expressible ops only).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ TextQueries.defs ++ SimilarityQueries.defs ++
      EventQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextQueries.oracles ++ SimilarityQueries.oracles ++
      EventQueries.oracles
}
