package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: headroom probe beyond the driver's sf0.1 bench — unions
  * the documents fixture N times (id-offset copies = planted exact
  * dups and 10-cliques of near-dups) and times the dedup suite at
  * 10x scale. Run manually; results recorded in ARCHITECTURE.md.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val big = (0 until copies).map { i =>
      base.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text", $"source")
    }.reduce(_ unionByName _)
      .repartition(8).cache()
    val n = big.count()
    println(s"corpus: $n docs (${copies}x sf0.1)")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val exact = time("exact_dedup")(operators.Dedup.exactDedup(big).count())
    println(s"  distinct texts: $exact")
    val mh = time("minhash_pairs")(
      operators.Dedup.minHashPairs(big, threshold = 0.9).count())
    println(s"  pairs j>=0.9: $mh")
    val sh = time("simhash_pairs")(
      operators.Dedup.simHashPairs(big, maxHamming = 3).count())
    println(s"  pairs hamming<=3: $sh")
    val ann = time("ann_topk")(
      operators.Similarity.annTopK(
        Tables.embeddings(spark, "/root/testdata/sf0.1"),
        Tables.embeddings(spark, "/root/testdata/sf0.1").filter($"vec_id" < 100),
        k = 10).count())
    println(s"  ann rows: $ann")
    val ivf = time("ivf_topk")(
      operators.Similarity.ivfTopK(
        Tables.embeddings(spark, "/root/testdata/sf0.1"),
        Tables.embeddings(spark, "/root/testdata/sf0.1").filter($"vec_id" < 100),
        k = 10).count())
    println(s"  ivf rows: $ivf")
    // deep-graph CC: a 50k-node chain (diameter 50k) — min-label would
    // need 50k rounds; star contraction is the only viable path
    val chain = spark.range(1L, 50000L)
      .select($"id".as("d1"), ($"id" - 1).as("d2"))
    val cc = time("star_cc_50k_chain")(
      operators.Dedup.connectedComponentsStars(chain).count())
    println(s"  chain nodes labeled: $cc")
    spark.stop()
  }
}
