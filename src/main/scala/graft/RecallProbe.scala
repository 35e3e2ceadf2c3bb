package graft

import org.apache.spark.sql.functions._

/** Dev tool: sweep the ANN dials (SRP tables/bits, IVF nlist/nprobe)
  * against the brute-force baseline and print recall@10 + wall time
  * per setting — how the fixture-tuned defaults in SimilarityQueries
  * were chosen, and the tool to re-run when the corpus changes.
  * Usage: RecallProbe [sfDir]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.create(appName = "graft-recall-probe",
      master = s"local[$cpus]", shufflePartitions = Some(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism).cache()
    emb.count()
    val queries = emb.filter($"vec_id" < 10)
    val exact = operators.Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").cache()
    val nExact = exact.count()

    def measure(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val approx = f.select("query_id", "neighbor_id")
      val hits = approx.join(exact, Seq("query_id", "neighbor_id")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s recall=${hits.toDouble / nExact}%5.2f  ($hits/$nExact)  $sec%6.2f s")
    }

    for (tables <- Seq(8, 16, 32); bits <- Seq(6, 8))
      measure(s"srp tables=$tables bits=$bits")(
        operators.Similarity.annTopK(emb, queries, k = 10,
          tables = tables, bits = bits))
    for (nlist <- Seq(32, 64); nprobe <- Seq(4, 8))
      measure(s"ivf nlist=$nlist nprobe=$nprobe")(
        operators.Similarity.ivfTopK(emb, queries, k = 10,
          nlist = nlist, nprobe = nprobe))
    spark.stop()
  }
}
