package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Sources

class SourcesSkewSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def tmpdir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("JDBC round-trip against embedded Derby, with predicate pushdown") {
    import spark.implicits._
    val url = s"jdbc:derby:${tmpdir("graft_derby")}/db;create=true"
    val summary = Tables.nation(spark, sf)
    Sources.writeJdbc(summary, url, "nation_t")
    val back = Sources.jdbc(spark, url, "nation_t")
    assert(back.collect().map(_.toSeq).toSet ==
      summary.collect().map(_.toSeq).toSet)

    // point filter pushes into the database scan
    val q = back.filter($"n_nationkey" === 7)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"),
      s"JDBC pushdown missing:\n$plan")
    assert(q.count() == 1)
  }

  test("partitioned JDBC read parallelizes") {
    val url = s"jdbc:derby:${tmpdir("graft_derby2")}/db;create=true"
    Sources.writeJdbc(Tables.customer(spark, sf), url, "customer_t")
    val part = Sources.jdbc(spark, url, "customer_t",
      partitioning = Some(("c_custkey", 0L, 150L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == Tables.customer(spark, sf).count())
  }

  test("JSONL source with explicit schema reads API-shaped payloads") {
    import spark.implicits._
    val dir = tmpdir("graft_json")
    val schema = StructType(Seq(
      StructField("country", StringType), StructField("iso3", StringType),
      StructField("year", StringType), StructField("value", DoubleType)))
    Seq(
      """{"country":"Cambodia","iso3":"KHM","year":"2023","value":58000.0}""",
      """{"country":"Indonesia","iso3":"IDN","year":"2023","value":1090000.0}""",
      """{"country":"Bad","iso3":"BAD","year":"2023"}""")
      .toDF("v").coalesce(1).write.mode("overwrite").text(s"$dir/in")
    val df = Sources.jsonl(spark, s"$dir/in", schema)
    assert(df.count() == 3)
    assert(df.filter($"value".isNull).count() == 1) // missing field -> null, no crash
    assert(df.schema == schema)
  }

  test("file sink round-trips csv/json/parquet/orc through one writer") {
    val dir = tmpdir("graft_sink2")
    val df = Tables.region(spark, sf)
    for (fmt <- Seq("csv", "json", "parquet", "orc")) {
      Sources.writeFile(df, s"$dir/$fmt", fmt)
      val back = fmt match {
        case "csv" => spark.read.option("header", "true")
          .schema(df.schema).csv(s"$dir/$fmt")
        case "json" => spark.read.schema(df.schema).json(s"$dir/$fmt")
        case "parquet" => spark.read.parquet(s"$dir/$fmt")
        case "orc" => Sources.orc(spark, s"$dir/$fmt")
      }
      assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet,
        s"$fmt round-trip mismatch")
    }
  }

  test("text-line corpus ingest: content-addressed ids, layout-independent") {
    val dir = tmpdir("graft_textsrc")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "dump.txt"),
      "alpha beta gamma\nsecond document here\nalpha beta gamma\n")
    val docs = Sources.textLines(spark, s"$dir/dump.txt").cache()
    assert(docs.count() == 3)
    assert(docs.columns.toSeq == Seq("doc_id", "text", "source"))
    // content-addressed: duplicate lines share an id, ids are a pure
    // function of content (stable under repartition)
    assert(docs.select("doc_id").distinct().count() == 2)
    val again = Sources.textLines(spark, s"$dir/dump.txt").repartition(7)
    assert(again.select("doc_id", "text").collect().map(_.toSeq).toSet ==
      docs.select("doc_id", "text").collect().map(_.toSeq).toSet)
    // provenance column carries the originating file
    import spark.implicits._
    assert(docs.select("source").as[String].collect().forall(_.endsWith("dump.txt")))
  }

  test("salted join returns exactly the rows of the plain join") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
    val plain = orders.join(cust, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_mktsegment")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(
        orders.withColumnRenamed("o_custkey", "c_custkey"), cust,
        keys = Seq("c_custkey"), saltBy = $"o_orderkey", buckets = 8)
      .select($"o_orderkey", $"c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salting spreads a hot key over multiple partitions") {
    import spark.implicits._
    // all rows share one key: unsalted join puts them in 1 task's hash bucket
    val hot = spark.range(10000).select(lit(1L).as("k"), $"id")
    val dim = Seq((1L, "x")).toDF("k", "v")
    val salted = hot.withColumn("__salt", pmod(xxhash64($"id"), lit(8L)))
    assert(salted.select("__salt").distinct().count() == 8)
    val joined = Skew.saltedJoin(hot, dim, Seq("k"), $"id", 8)
    assert(joined.count() == 10000)
  }

  test("approximate variants track exact results (the 100TB swap)") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val exact = li.agg(countDistinct($"l_orderkey")).first().getLong(0)
    val approx = li.agg(approx_count_distinct($"l_orderkey", 0.01)).first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx_count_distinct off: $approx vs $exact")

    val med = Tables.customer(spark, sf)
      .agg(median($"c_acctbal")).first().getDouble(0)
    val amed = Tables.customer(spark, sf)
      .agg(percentile_approx($"c_acctbal", lit(0.5), lit(10000)))
      .first().getDouble(0)
    assert(math.abs(amed - med) / math.max(med.abs, 1.0) < 0.05)
  }
}
