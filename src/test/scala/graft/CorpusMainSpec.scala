package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sharding, TextAnalysis}

/** CorpusMain drives the flagship composition end-to-end; this spec
  * pins its stage counts against the SAME operators composed directly,
  * and the written artifact against the report. */
class CorpusMainSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private lazy val docsPath = s"$sf/documents.parquet"

  test("CorpusMain report matches the directly-composed operators") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val report = CorpusMain.run(spark, docsPath, outDir)

    val docs = spark.read.parquet(docsPath)
    val cleaned = docs.join(
      TextAnalysis.cleanCorpus(docs).select("doc_id"), Seq("doc_id"), "left_semi")
    val deduped = Dedup.dedupCorpus(cleaned)
    assert(report.nInput == docs.count())
    assert(report.nCleaned == cleaned.count())
    assert(report.nDeduped == deduped.count())
    assert(report.nSampled == report.nDeduped, "fraction 1.0 must not drop rows")
    // the pipeline must actually filter something on this fixture, or
    // the stage counts prove nothing
    assert(report.nCleaned < report.nInput)
    assert(report.nDeduped < report.nCleaned)

    // written artifact == report: same rows, same shard/token totals,
    // and every doc is a survivor of the composed dedup
    val out = spark.read.parquet(s"$outDir/corpus")
    assert(out.count() == report.nSampled)
    assert(out.select("shard_id").distinct().count() == report.nShards)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_tokens"))
      .first().getLong(0) == report.totalTokens)
    assert(out.join(deduped, Seq("doc_id"), "left_anti").count() == 0)

    // report round-trips through its parquet
    val rep = spark.read.parquet(s"$outDir/report").first()
    assert(rep.getAs[Long]("nDeduped") == report.nDeduped)
  }

  test("CorpusMain ingests a raw .txt dump end-to-end (content-addressed ids)") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_txt_in")
    // 30 English lines long enough to clear the clean recipe's token
    // floor, with one exact duplicate that must collapse
    val line = (1 to 25).map(i => s"the quick brown fox is a token$i of the corpus and").mkString(" ")
    val lines = (1 to 29).map(i => s"doc $i says the a of to in and is " + line) :+
      ("doc 1 says the a of to in and is " + line)
    java.nio.file.Files.writeString(srcDir.resolve("dump.txt"), lines.mkString("\n"))
    val outDir = java.nio.file.Files.createTempDirectory("graft_txt_out").toString
    val report = CorpusMain.run(spark, s"$srcDir/dump.txt", outDir,
      minQuality = 0.0, maxTopBigramRatio = 1.0, minTokens = 5, maxTokens = 100000)
    // duplicate line shares its content-addressed id -> 29 distinct docs in
    assert(report.nInput == 30)
    assert(report.nDeduped <= 29, "the exact duplicate line must collapse")
    assert(report.nDeduped > 0)
    val out = spark.read.parquet(s"$outDir/corpus")
    assert(out.count() == report.nSampled)
  }

  test("CorpusMain packing stage writes lossless sequences of the sampled corpus") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_corpus_p").toString
    val report = CorpusMain.run(spark, docsPath, outDir, seqLen = Some(64L))
    val seqs = spark.read.parquet(s"$outDir/sequences")
    assert(report.nFragments == seqs.count())
    assert(report.nSequences ==
      seqs.select("source", "seq_id").distinct().count())
    // lossless vs the written corpus: fragment tokens == corpus tokens
    val corpusTokens = spark.read.parquet(s"$outDir/corpus")
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).first().getLong(0)
    val fragTokens = seqs
      .agg(org.apache.spark.sql.functions.sum("frag_len")).first().getLong(0)
    assert(fragTokens == corpusTokens)
    // report round-trips the packing counts
    val rep = spark.read.parquet(s"$outDir/report").first()
    assert(rep.getAs[Long]("nSequences") == report.nSequences)
    assert(rep.getAs[Long]("nFragments") == report.nFragments)
  }

  test("CorpusMain passage-prune stage composes prunePassages on the deduped corpus") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_corpus_pp").toString
    val report = CorpusMain.run(spark, docsPath, outDir,
      prunePassageTokens = Some(32))
    val docs = spark.read.parquet(docsPath)
    val cleaned = docs.join(
      TextAnalysis.cleanCorpus(docs).select("doc_id"), Seq("doc_id"), "left_semi")
    val deduped = Dedup.dedupCorpus(cleaned)
    val pruned = TextAnalysis.prunePassages(deduped, chunkTokens = 32)
    assert(report.nScrubDropped == deduped.count() - pruned.count())
    assert(report.nSampled == pruned.count())
    // the written corpus carries the REBUILT text, not the original
    val out = spark.read.parquet(s"$outDir/corpus")
    val joined = out.select("doc_id", "text")
      .join(pruned.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("pruned_text")), Seq("doc_id"))
    assert(joined.filter(
      org.apache.spark.sql.functions.col("text") =!=
      org.apache.spark.sql.functions.col("pruned_text")).count() == 0)
    // report round-trips the new field
    val rep = spark.read.parquet(s"$outDir/report").first()
    assert(rep.getAs[Long]("nScrubDropped") == report.nScrubDropped)
  }

  test("CorpusMain sample fraction composes hashSample semantics") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_corpus_s").toString
    val report = CorpusMain.run(spark, docsPath, outDir, sampleFraction = 0.5)
    val docs = spark.read.parquet(docsPath)
    val cleaned = docs.join(
      TextAnalysis.cleanCorpus(docs).select("doc_id"), Seq("doc_id"), "left_semi")
    val expected = Sharding.hashSample(Dedup.dedupCorpus(cleaned), 0.5).count()
    assert(report.nSampled == expected)
    assert(report.nSampled < report.nDeduped)
  }
}
