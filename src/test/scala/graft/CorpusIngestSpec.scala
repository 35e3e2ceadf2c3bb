package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.CorpusIngest

/** Continuous-ingest contract: per-wave results equal the composed
  * batch operators, the corpus only ever grows by novel docs, and a
  * re-run with nothing new changes nothing (checkpoint + idempotent
  * partition writes). */
class CorpusIngestSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val fixtureDocs = Tables.documents(spark, SparkTestSession.sf)
  private val docSchema = fixtureDocs.schema

  /** Land a wave as ONE parquet file directly in the landing dir (the
    * file stream source lists files, not nested write directories). */
  private def landFile(df: org.apache.spark.sql.DataFrame,
                       inDir: String, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_wave").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(inDir, name))
  }

  /** Composed batch expectation for one wave against a corpus state. */
  private def expectedNovel(wave: org.apache.spark.sql.DataFrame,
                            corpus: Option[org.apache.spark.sql.DataFrame]) = {
    val cleaned = wave.join(
      TextAnalysis.cleanCorpus(wave).select("doc_id"), Seq("doc_id"), "left_semi")
    val batchNovel = Dedup.dedupCorpus(cleaned)
    corpus match {
      case Some(c) => Dedup.deltaDedup(
        c.select(batchNovel.columns.map(col): _*), batchNovel)
      case None => batchNovel
    }
  }

  test("ingest stream: wave-accurate novelty, growth only, idempotent re-run") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ingest_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString

    // wave 1: first half of the fixture
    val wave1 = fixtureDocs.filter($"doc_id" < 250)
    landFile(wave1, inDir, "wave1.parquet")
    CorpusIngest.start(spark, inDir, outDir, docSchema).awaitTermination()

    val corpus1 = CorpusIngest.readCorpus(spark, s"$outDir/corpus").get
    val exp1 = expectedNovel(wave1, None)
    assert(corpus1.count() == exp1.count())
    assert(corpus1.join(exp1.select("doc_id"), Seq("doc_id"), "left_anti").count() == 0)

    // wave 2: second half PLUS exact copies of wave-1 docs (must all
    // be rejected as non-novel against the accumulated corpus)
    val wave2 = fixtureDocs.filter($"doc_id" >= 250)
      .unionByName(fixtureDocs.filter($"doc_id" < 40))
    landFile(wave2, inDir, "wave2.parquet")
    CorpusIngest.start(spark, inDir, outDir, docSchema).awaitTermination()

    val corpus2 = CorpusIngest.readCorpus(spark, s"$outDir/corpus").get
    val exp2 = expectedNovel(wave2, Some(corpus1))
    assert(corpus2.count() == corpus1.count() + exp2.count(),
      "corpus grows by exactly the novel docs of wave 2")
    // re-ingested wave-1 copies must not reappear: every wave-1 id
    // occurs at most once in the final corpus
    assert(corpus2.groupBy("doc_id").count().filter($"count" > 1).count() == 0)

    // nothing new landed: a third run must not change the corpus
    CorpusIngest.start(spark, inDir, outDir, docSchema).awaitTermination()
    val corpus3 = CorpusIngest.readCorpus(spark, s"$outDir/corpus").get
    assert(corpus3.count() == corpus2.count())

    // provenance partitions: one directory per processed batch
    val parts = spark.read.parquet(s"$outDir/corpus")
      .select("ingest_batch").distinct().as[Long].collect().sorted
    assert(parts.length == 2, s"expected batches 0 and 1, got ${parts.toSeq}")

    // per-batch funnel reports mirror what actually landed
    val reports = spark.read.parquet(s"$outDir/reports")
      .select($"ingest_batch".cast("long"), $"n_input", $"n_novel")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(reports(0L)._1 == wave1.count() && reports(0L)._2 == corpus1.count())
    assert(reports(1L)._1 == wave2.count())
    assert(reports(1L)._2 == corpus2.count() - corpus1.count())
  }

  test("deltaDedupIndexed equals deltaDedup on the same corpus/delta split") {
    val corpus = fixtureDocs.filter($"doc_id" % 5 =!= 0)
    val delta = fixtureDocs.filter($"doc_id" % 5 === 0)
    val direct = Dedup.deltaDedup(corpus, delta)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val indexed = Dedup.deltaDedupIndexed(
        Dedup.buildDedupIndex(corpus), delta)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed == direct,
      s"missing=${(direct -- indexed).take(5)} extra=${(indexed -- direct).take(5)}")
  }

  test("deltaDedupIndexed equals deltaDedup under a hot-shingle cap") {
    val corpus = fixtureDocs.filter($"doc_id" % 5 =!= 0)
    val delta = fixtureDocs.filter($"doc_id" % 5 === 0)
    // cap low enough to actually drop shingles on the fixture (the
    // equivalence must hold on a cap that BITES, not a no-op one) —
    // and the capped answer must differ from the uncapped one, or the
    // case degenerates into the test above (cap=25 measured as a no-op
    // at this scale: the fixture's cross-doc shingle dfs are small)
    val cap = 2
    val direct = Dedup.deltaDedup(corpus, delta,
        maxShingleDocFreq = Some(cap))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val indexed = Dedup.deltaDedupIndexed(
        Dedup.buildDedupIndex(corpus), delta,
        maxShingleDocFreq = Some(cap))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed == direct,
      s"missing=${(direct -- indexed).take(5)} extra=${(indexed -- direct).take(5)}")
    val uncapped = Dedup.deltaDedup(corpus, delta)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed != uncapped,
      s"cap=$cap did not bite on the fixture — raise the fixture's " +
        "shingle overlap or lower the cap")
  }

  test("ingest containment gate: a quoted delta doc is rejected at ingest time only under the dial") {
    // batch 0 lands a long doc ending in a 14-word quote; batch 1
    // brings the quote back as its own doc (plus one genuinely novel
    // doc). Jaccard alone keeps the quote (the container dominates
    // the union); the containment dial drops it — the q135 semantics
    // running through the production foreachBatch path against the
    // materialized index.
    val filler = (1 to 100).map(i => s"f$i").mkString(" ")
    val quote = (1 to 14).map(i => s"q$i").mkString(" ")
    val b1 = Seq((1L, s"$filler $quote", "s1")).toDF("doc_id", "text", "source")
    val b2 = Seq(
      (2L, s"$quote t1 t2 t3", "s1"),
      (3L, (1 to 30).map(i => s"n$i").mkString(" "), "s1"))
      .toDF("doc_id", "text", "source")
    // synthetic tokens land on the heuristic's "unknown" bucket; the
    // clean dials are opened so only the dedup gates decide
    val langs = TextAnalysis.withLanguageId(b1.unionByName(b2))
      .select("lang_pred").distinct().as[String].collect().toSeq
    def ingest(perm: Option[Long]): Set[Long] = {
      val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_cont").toString
      CorpusIngest.processBatch(b1, outDir, 0L, minTokens = 1,
        minQuality = 0.0, maxTopBigramRatio = 1.0, langs = langs,
        containmentPermille = perm)
      CorpusIngest.processBatch(b2, outDir, 1L, minTokens = 1,
        minQuality = 0.0, maxTopBigramRatio = 1.0, langs = langs,
        containmentPermille = perm)
      CorpusIngest.readCorpus(spark, s"$outDir/corpus").get
        .select("doc_id").as[Long].collect().toSet
    }
    assert(ingest(None) == Set(1L, 2L, 3L),
      "without the dial the quoted doc slips through the Jaccard gate")
    assert(ingest(Some(800L)) == Set(1L, 3L),
      "with the dial the quoted doc is non-novel; the novel doc still lands")
  }

  test("the materialized index mirrors the written corpus after every batch") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_idx").toString
    CorpusIngest.processBatch(fixtureDocs.filter($"doc_id" < 200), outDir, 0L)
    CorpusIngest.processBatch(fixtureDocs.filter($"doc_id" >= 200), outDir, 1L)
    val corpus = CorpusIngest.readCorpus(spark, s"$outDir/corpus").get
    val rebuilt = Dedup.buildDedupIndex(corpus)
    val storedHashes = spark.read.parquet(s"$outDir/index/hashes")
      .select("content_md5").collect().map(_.getString(0)).toSet
    assert(storedHashes ==
      rebuilt.hashes.collect().map(_.getString(0)).toSet)
    val storedCounts = spark.read.parquet(s"$outDir/index/counts")
      .select("c_id", "nc").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rebuiltCounts = rebuilt.counts
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(storedCounts == rebuiltCounts)
  }

  test("a straddled index (pre-denormalization batches) repairs df and nc exactly") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_str").toString
    CorpusIngest.processBatch(fixtureDocs.filter($"doc_id" < 200), outDir, 0L)
    // devolve batch 0 to the pre-denormalization vintage: its shingle
    // rows lose the carried nc and its dfs partial disappears — the
    // state an index upgraded mid-ingest is actually in
    val shDir = s"$outDir/index/shingles/ingest_batch=0"
    val legacy = spark.read.parquet(shDir).drop("nc")
    val tmp = java.nio.file.Files.createTempDirectory("graft_str_tmp").toString
    legacy.write.mode("overwrite").parquet(tmp)
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete()
    }
    rmrf(new java.io.File(shDir))
    new java.io.File(tmp).renameTo(new java.io.File(shDir))
    rmrf(new java.io.File(s"$outDir/index/dfs/ingest_batch=0"))
    // a post-upgrade batch lands beside it
    CorpusIngest.processBatch(
      fixtureDocs.filter($"doc_id" >= 200 && $"doc_id" < 400), outDir, 1L)
    // the straddled read must reconstruct EXACTLY the index a fresh
    // build over the accumulated corpus produces: summing only the
    // post-upgrade dfs partials would undercount every shingle the
    // legacy prefix contains, and a schema-sampled read could feed
    // NULL nc into the jaccard filter
    val idx = CorpusIngest.readIndexExcluding(spark, outDir, 99L).get
    val corpus = CorpusIngest.readCorpus(spark, s"$outDir/corpus").get
    val rebuilt = Dedup.buildDedupIndex(corpus)
    def dfMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dfMap(idx.dfs.select($"shingle", $"df")) ==
      dfMap(rebuilt.dfs.select($"shingle", $"df".cast("long"))))
    assert(dfMap(idx.shingles.select($"c_id", $"nc").distinct()) ==
      dfMap(rebuilt.counts))
    assert(idx.shingles.filter($"nc".isNull).count() == 0)
  }

  test("publishSnapshot: same docs, no provenance column, sorted file layout") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_snap").toString
    val snapDir = java.nio.file.Files.createTempDirectory("graft_snap").toString + "/v1"
    CorpusIngest.processBatch(fixtureDocs.filter($"doc_id" < 200), outDir, 0L)
    CorpusIngest.processBatch(fixtureDocs.filter($"doc_id" >= 200), outDir, 1L)
    val n = CorpusIngest.publishSnapshot(spark, outDir, snapDir,
      targetFileBytes = 16L << 10)
    val corpus = CorpusIngest.readCorpus(spark, s"$outDir/corpus").get
    val snap = spark.read.parquet(snapDir)
    assert(n == corpus.count() && snap.count() == n)
    assert(!snap.columns.contains("ingest_batch"))
    assert(snap.join(corpus.select("doc_id"), Seq("doc_id"), "left_anti").count() == 0)
    // sorted layout: per-file doc_id ranges are disjoint
    val ranges = snap.groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("batch replay is idempotent: reprocessing overwrites, never double-appends") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_rep").toString
    val wave = fixtureDocs.filter($"doc_id" < 100)
    CorpusIngest.processBatch(wave, outDir, batchId = 0L)
    val once = CorpusIngest.readCorpus(spark, s"$outDir/corpus").get.count()
    // crash-replay of the SAME batch id
    CorpusIngest.processBatch(wave, outDir, batchId = 0L)
    val twice = CorpusIngest.readCorpus(spark, s"$outDir/corpus").get.count()
    assert(once == twice, "replaying a batch id must overwrite its partition")
  }
}
