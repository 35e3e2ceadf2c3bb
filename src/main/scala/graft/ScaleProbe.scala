package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: headroom probe beyond the driver's sf0.1 bench. Scales
  * the documents/embeddings fixtures N× with CONTENT-UNIQUE copies and
  * times the LSH/CC/ANN paths at each scale, printing a table +
  * per-scale JSON lines (recorded in ARCHITECTURE.md §headroom).
  *
  * Content-unique means: every copied doc's vocabulary is suffixed
  * with its copy id (no cross-copy shingle collisions) and every
  * copied vector is deterministically rotated off its source direction
  * — so 10× data is 10× WORK, and the table checks near-linear
  * scaling of each path. The other regime — copies that ARE near-dups
  * of each other, where candidate pairs grow quadratically in the
  * clique size — is the adversarial case covered by the hot-bucket
  * skew spec and the exact-dedup pre-pass (see Dedup.exactDedup's
  * scaladoc); mixing it into the scaling table would measure pair
  * OUTPUT growth, not engine overhead.
  *
  * Usage: ScaleProbe [scale ...]   (default: 1 10)
  */
object ScaleProbe {

  private def timeIt[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** N content-unique copies of the documents fixture: copy i suffixes
    * every token with "xi", so shingles never collide across copies
    * while each copy keeps the fixture's own near-dup structure. */
  def scaledDocs(spark: SparkSession, dir: String, copies: Int): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir).select("doc_id", "text", "source")
    (0 until copies).map { i =>
      base.select(
        ($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        (if (i == 0) $"text"
         else regexp_replace($"text", "([A-Za-z0-9]+)", s"$$1x$i")).as("text"),
        $"source")
    }.reduce(_ unionByName _)
  }

  /** N direction-unique copies of the embeddings fixture: copy i adds
    * a deterministic per-element offset (sin of ids), rotating the
    * vector off its source so cross-copy cosines stay unclustered. */
  def scaledEmbeddings(spark: SparkSession, dir: String, copies: Int): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    (0 until copies).map { i =>
      if (i == 0) base
      else base.select(
        ($"vec_id" + lit(i * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, j) -> x + float(sin(vec_id * 31 + j * 7 + $i)) * 0.5f)")
          .as("embedding"))
    }.reduce(_ unionByName _)
  }

  /** BPE headroom: the scale dial for a tokenizer is the MERGE COUNT,
    * not corpus copies — a real tokenizer trains 30k–50k merges where
    * the oracle-gated q169 proves 16. Sweeps merges 16× across train
    * (expect wall/round ≈ flat: every round is one |vocab|-row
    * aggregate + a 1-row argmax, corpus size enters only the first
    * scan) and the dictionary encode (expect ∝ merges: the fold
    * applies every merge to every distinct token). Rows recorded in
    * ARCHITECTURE.md §headroom. Usage: ScaleProbe bpe [merge ...] */
  def bpeProbe(spark: SparkSession, dir: String, merges: Seq[Int]): Unit = {
    import spark.implicits._
    // the raw fixture's vocabulary is only 31 words — BPE would exhaust
    // its pair space long before realistic merge counts. Content-unique
    // 10× copies (suffixed tokens) lift |vocab| ~10× and the symbol
    // alphabet picks up the digit suffixes, so hundreds of merges have
    // real pairs to consume while corpus volume ALSO scales — both
    // dials of the real tokenizer job move together.
    val docs = scaledDocs(spark, dir, 10).select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    docs.count()
    merges.foreach { m =>
      val (table, trainSec) = timeIt {
        val t = operators.Bpe.train(docs, numMerges = m)
        t.localCheckpoint() // count() then reuse without replaying rounds
      }
      val trained = table.count()
      val toks = docs.select(explode(split($"text", " ")).as("tok"))
      val (nvocab, encSec) = timeIt(
        operators.Bpe.encodeVocab(toks, table).count())
      val (_, statsSec) = timeIt(
        operators.Bpe.encodeStats(docs, table).count())
      println(f"bpe merges=$m%-5d (trained $trained%4d) train $trainSec%8.2f s " +
        f"(${trainSec / trained.max(1L) * 1000}%7.1f ms/round)  " +
        f"encodeVocab $encSec%7.2f s  encodeStats $statsSec%7.2f s  " +
        f"vocab=$nvocab")
      println(s"""{"probe":"bpe","merges":$m,"trained":$trained,"train_sec":${
        math.round(trainSec * 1000) / 1000.0},"round_ms":${
        math.round(trainSec / trained.max(1L) * 1000)},"encode_vocab_sec":${
        math.round(encSec * 1000) / 1000.0},"encode_stats_sec":${
        math.round(statsSec * 1000) / 1000.0},"vocab":$nvocab}""")
    }
    docs.unpersist()
  }

  /** trainLocal headroom at REALISTIC merge counts (a production
    * tokenizer trains 30k–50k merges; the oracle-gated q169 proves
    * 16): the driver-side trainer's per-round full recount is
    * O(Σ|word symbols|) by design (`Bpe.scala` reserves the
    * incremental pair index if this probe ever demands it). The dial
    * that matters is DISTINCT WORDS — corpus volume enters only the
    * one vocabulary scan — so the probe synthesizes a vocabulary
    * large enough that 30k merges never exhaust the pair space
    * (Σ(|word|−1) ≈ 7·nWords potential merges), with mild count
    * variation so argmax ties are not the only path. Usage:
    * ScaleProbe bpe-local [nwords merge ...] */
  def bpeLocalProbe(spark: SparkSession, nWords: Int, merges: Seq[Int]): Unit = {
    import spark.implicits._
    // deterministic base-26 words ("w" + digits 0-9a-p), 1-5 copies
    val docs = (0 until nWords).map { i =>
      val w = "w" + java.lang.Long.toString(i.toLong, 26)
      (i.toLong, (Seq.fill(1 + i % 5)(w)).mkString(" "))
    }.toDF("doc_id", "text")
    val nsyms = (0 until nWords.min(200000))
      .map(i => 1 + java.lang.Long.toString(i.toLong, 26).length).sum
    println(s"bpe-local vocab: $nWords distinct words, ~$nsyms symbol slots")
    merges.foreach { m =>
      val (table, sec) = timeIt {
        val t = operators.Bpe.trainLocal(docs, numMerges = m)
        t.localCheckpoint()
      }
      val trained = table.count()
      println(f"bpe-local merges=$m%-6d (trained $trained%5d) " +
        f"$sec%8.2f s (${sec / trained.max(1L) * 1000}%7.2f ms/round)")
      println(s"""{"probe":"bpe-local","nwords":$nWords,"merges":$m,""" +
        s""""trained":$trained,"train_sec":${math.round(sec * 1000) / 1000.0},""" +
        s""""round_ms":${math.round(sec / trained.max(1L) * 1000000) / 1000.0}}""")
    }
  }

  /** Archive-ingest path comparison: the SAME corpus as WET archive
    * FILES read three ways — whole-file (`binaryFile` + per-row
    * expansion), sliced (whole-file rows fanned out per member by
    * in-memory substring), and RANGED (streaming path index once +
    * per-member byte-range reads, no payload rows anywhere). Wall
    * times are same-machine comparable; the ranged row also reports
    * its one-off index-build cost separately (in production the index
    * ships with the crawl). Usage: ScaleProbe archive [nArch] */
  def archiveProbe(spark: SparkSession, dir: String, nArch: Int): Unit = {
    import spark.implicits._
    val docs = scaledDocs(spark, dir, 10)
      .select(expr("doc_id"), col("text"),
        expr(s"concat('arc', pmod(doc_id, $nArch))").as("source"))
    val root = java.nio.file.Files.createTempDirectory("graft-arcprobe").toFile
    val arcDir = new java.io.File(root, "arcs"); arcDir.mkdirs()
    val files = graft.sources.WebArchive.buildWetArchives(docs)
      .as[(String, Array[Byte])].collect().map { case (a, p) =>
        val f = new java.io.File(arcDir, s"$a.warc.gz")
        java.nio.file.Files.write(f.toPath, p)
        "file:" + f.getAbsolutePath
      }
    val nDocs = docs.count()
    val bytes = files.map(f => new java.io.File(f.stripPrefix("file:")).length).sum
    println(s"archive probe: $nArch archives, $nDocs docs, $bytes compressed bytes")
    def fileRows = spark.read.format("binaryFile").load(arcDir.getAbsolutePath)
      .select(col("path").as("archive"), col("content").as("payload"))
    val (nWhole, tWhole) = timeIt(
      graft.sources.WebArchive.wetDocuments(fileRows)
        .filter(col("quarantine").isNull).count())
    val (nSliced, tSliced) = timeIt(
      graft.sources.WebArchive.wetDocumentsSliced(fileRows)
        .filter(col("quarantine").isNull).count())
    val idxPath = new java.io.File(root, "index").getAbsolutePath
    val (_, tIndex) = timeIt {
      graft.sources.WebArchive
        .memberIndexFromPaths(files.toSeq.toDF("archive"))
        .write.mode("overwrite").parquet(idxPath)
    }
    val (nRanged, tRanged) = timeIt(
      graft.sources.WebArchive.wetDocumentsRanged(spark.read.parquet(idxPath))
        .filter(col("quarantine").isNull).count())
    val (nCoal, tCoal) = timeIt(
      graft.sources.WebArchive.wetDocumentsRanged(spark.read.parquet(idxPath),
        coalesceMembers = 64)
        .filter(col("quarantine").isNull).count())
    require(nWhole == nDocs && nSliced == nDocs && nRanged == nDocs &&
      nCoal == nDocs,
      s"paths disagree: whole=$nWhole sliced=$nSliced ranged=$nRanged " +
        s"coalesced=$nCoal docs=$nDocs")
    println(f"archive whole-file $tWhole%7.2f s   sliced $tSliced%7.2f s   " +
      f"ranged $tRanged%7.2f s   ranged-coalesced(64) $tCoal%7.2f s " +
      f"(+ index build $tIndex%6.2f s, one-off)")
    println(s"""{"probe":"archive","n_arch":$nArch,"n_docs":$nDocs,""" +
      s""""bytes":$bytes,"whole_sec":${math.round(tWhole * 1000) / 1000.0},""" +
      s""""sliced_sec":${math.round(tSliced * 1000) / 1000.0},""" +
      s""""ranged_sec":${math.round(tRanged * 1000) / 1000.0},""" +
      s""""ranged64_sec":${math.round(tCoal * 1000) / 1000.0},""" +
      s""""index_sec":${math.round(tIndex * 1000) / 1000.0}}""")
  }

  /** The `coalesceMembers` CROSSOVER measurement (r15 verdict: the
    * dial's winning regime — per-request latency — had never been
    * demonstrated; the only data was page-cached local files, where
    * it loses). Routes the ranged fetch through
    * [[graft.sources.SlowLocalFileSystem]] (`slowfile:` = local FS +
    * `delayMs` sleep per POSITIONED read, the object-store GET model)
    * and times k ∈ {1, 8, 64} over an `nMembers`-member index,
    * recording the issued-request count alongside wall time: the
    * request count is the deterministic half of the claim (cut k×),
    * the wall time is the latency half (≈ requests × delay /
    * parallelism). Both forms get the same fan-out so the comparison
    * is pure request arithmetic. The index is BUILT over `file:`
    * paths (no delay — the indexer's sequential streaming is not
    * what this probe measures) and rewritten to `slowfile:` for the
    * fetch. Usage: ScaleProbe archive-latency [nMembers] [delayMs] */
  def archiveLatencyProbe(spark: SparkSession, nMembers: Int,
                          delayMs: Long): Unit = {
    import spark.implicits._
    val docs = spark.range(nMembers.toLong).select(
      $"id".as("doc_id"),
      concat(lit("member payload number "), $"id").as("text"),
      lit("arcL").as("source"))
    val root = java.nio.file.Files.createTempDirectory("graft-latprobe").toFile
    val arcDir = new java.io.File(root, "arcs"); arcDir.mkdirs()
    graft.sources.WebArchive.buildWetArchives(docs)
      .as[(String, Array[Byte])].collect().foreach { case (a, p) =>
        java.nio.file.Files.write(
          new java.io.File(arcDir, s"$a.warc.gz").toPath, p)
      }
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slowfile.impl", "graft.sources.SlowLocalFileSystem")
    hc.set("fs.slowfile.delay.ms", delayMs.toString)
    val files = arcDir.listFiles().map(f => "file:" + f.getAbsolutePath).toSeq
    val idxPath = new java.io.File(root, "idx").getAbsolutePath
    graft.sources.WebArchive.memberIndexFromPaths(files.toDF("archive"))
      .withColumn("archive",
        regexp_replace(col("archive"), "^file:", "slowfile:"))
      .write.mode("overwrite").parquet(idxPath)
    val index = spark.read.parquet(idxPath)
    val fan = Some(spark.sparkContext.defaultParallelism * 4)
    val cells = Seq(1, 8, 64).map { k =>
      graft.sources.SlowLocalFileSystem.positionedReads.set(0L)
      val df = graft.sources.WebArchive.sliceMembersRanged(index,
        fanoutPartitions = fan, coalesceMembers = k)
        .filter(col("slice_err").isNull)
      // the fetch stage's REAL task count — the fan-out claim is about
      // where the reads run, and an optimizer/AQE surprise that moves
      // them into a 1-task stage shows up here, not in wall time alone
      val parts = df.rdd.getNumPartitions
      val (n, sec) = timeIt(df.count())
      val reads = graft.sources.SlowLocalFileSystem.positionedReads.get()
      require(n == nMembers, s"k=$k recovered $n of $nMembers members")
      println(f"latency probe k=$k%-3d ${sec}%7.2f s   " +
        f"($reads ranged reads, $parts partitions)")
      if (sys.env.contains("SPARK_GRAFT_PROBE_EXPLAIN"))
        System.err.println(df.queryExecution.executedPlan.toString)
      s""""k$k":{"sec":${math.round(sec * 1000) / 1000.0},"reads":$reads,""" +
        s""""parts":$parts}"""
    }
    println(s"""{"probe":"archive_latency","members":$nMembers,""" +
      s""""delay_ms":$delayMs,""" + cells.mkString(",") + "}")
  }

  /** PSL full-list headroom: the embedded rule subset is ~260 rules;
    * production loads the full publicsuffix.org file (~15k). The
    * matcher compiles rules to InSet probes inside a when-chain, so
    * the open question (r13 verdict) is PLAN cost, not row cost: does
    * a 15k-literal expression tree analyze/codegen/broadcast in
    * acceptable time? The probe synthesizes a full-size rule set
    * (real shape: ~94% two-label normals, wildcard + exception
    * families), times analysis (explain) and execution of domainStats
    * over the fixture, and prints the compiled plan's string size as
    * the task-binary proxy. Usage: ScaleProbe psl [nRules] */
  def pslProbe(spark: SparkSession, dir: String, nRules: Int): Unit = {
    import graft.operators.Domains
    val lines = (0 until nRules).map { i =>
      val base = "r" + java.lang.Long.toString(i.toLong, 36)
      i % 50 match {
        case 48 => s"*.$base.zz"
        case 49 => s"!x.$base.zz"
        case _ => s"$base.zz"
      }
    }
    val (rules, tParse) = timeIt(Domains.PslRules.fromLines(lines))
    val docs = scaledDocs(spark, dir, 1)
      .select(col("doc_id"), col("text"),
        expr("concat('https://www.', pmod(doc_id, 1000), '.r', " +
          "pmod(doc_id, 777), '.zz/p/', doc_id)").as("uri"))
    val stats = docs
      .withColumn("host", Domains.uriHost(col("uri")))
      .withColumn("domain",
        Domains.registrableDomainPsl(col("host"), rules))
      .groupBy("domain").count()
    val (planLen, tAnalyze) = timeIt(
      stats.queryExecution.executedPlan.toString.length)
    val (n, tCold) = timeIt(stats.count())
    // warm run: codegen/InSet-build/scan-setup amortized — the cost a
    // long-lived job actually pays per batch
    val (_, tWarm) = timeIt(stats.count())
    println(f"psl rules=$nRules parse ${tParse * 1000}%.0f ms  " +
      f"analyze+plan ${tAnalyze * 1000}%.0f ms (plan string $planLen B)  " +
      f"run cold ${tCold * 1000}%.0f ms / warm ${tWarm * 1000}%.0f ms " +
      f"($n domains)")
    println(s"""{"probe":"psl","rules":$nRules,"parse_ms":${
      math.round(tParse * 1000)},"plan_ms":${math.round(tAnalyze * 1000)},""" +
      s""""plan_bytes":$planLen,"cold_ms":${math.round(tCold * 1000)},""" +
      s""""warm_ms":${math.round(tWarm * 1000)},"n_domains":$n}""")
  }

  /** Named-character-reference frequency by decoder tier (r17 — the
    * VERDICT r16 ask: the "HTML5-only names are vanishingly rare"
    * claim was itself unmeasured). Scans every `&name[;]` candidate in
    * the documents corpus at the given SF and buckets it:
    * HTML4+symbol (in [[graft.functions.HtmlUnescapeCore.Named]]),
    * legacy-no-semicolon (in `Legacy`, matched without `;`), UNKNOWN
    * (would pass through undecoded — the HTML5-only ~2k tail or plain
    * prose ampersands). Distinct-name counts aggregate distributed
    * (groupBy name — bounded by the name vocabulary, not the corpus);
    * classification is driver-side over that tiny frame. PROVENANCE:
    * the corpus is the synthetic testdata fixture, not a real crawl —
    * the probe measures what OUR gates exercise and gives the
    * methodology; the number for real crawl text needs real crawl
    * text (no egress). Usage: ScaleProbe entities */
  def entityTailProbe(spark: SparkSession, dir: String): Unit = {
    import graft.functions.HtmlUnescapeCore
    val docs = Tables.documents(spark, dir).select(col("text"))
    val nDocs = docs.count()
    // with-semicolon candidates (the only form HTML5-only names have)
    val withSemi = docs
      .select(explode(expr(
        "regexp_extract_all(text, '&([A-Za-z][A-Za-z0-9]{1,31});', 1)"))
        .as("name"))
      .groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // bare `&name` candidates (legacy decode territory) — counted
    // separately; the same text span can appear in both tallies, the
    // tiers below only read the one that decides its decode
    val bare = docs
      .select(explode(expr(
        "regexp_extract_all(text, '&([A-Za-z][A-Za-z0-9]{1,31})', 1)"))
        .as("name"))
      .groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val html4 = withSemi.filter(c => HtmlUnescapeCore.Named.contains(c._1))
    val unknown = withSemi.filterNot(c => HtmlUnescapeCore.Named.contains(c._1))
    val legacyBare = bare.filter { case (n, _) =>
      HtmlUnescapeCore.Legacy.exists(l => n.startsWith(l)) }
    def total(a: Array[(String, Long)]) = a.map(_._2).sum
    println(f"entities docs=$nDocs  html4+symbol(&x;)=${total(html4)}%d " +
      f"(${html4.length} names)  unknown(&x; passthrough)=${total(unknown)}%d " +
      f"(${unknown.length} names)  legacy-prefix(&x bare)=${total(legacyBare)}%d")
    if (unknown.nonEmpty)
      println("top unknown: " + unknown.sortBy(-_._2).take(20)
        .map { case (n, c) => s"&$n;=$c" }.mkString(" "))
    println(s"""{"probe":"entities","docs":$nDocs,""" +
      s""""html4_hits":${total(html4)},"html4_names":${html4.length},""" +
      s""""unknown_hits":${total(unknown)},"unknown_names":${unknown.length},""" +
      s""""legacy_bare_hits":${total(legacyBare)}}""")
  }

  /** The ladder's MEMORY axis (r17 — VERDICT r16 task 7: the 64×
    * cells measured wall time only; the 100 TB posture needs the
    * memory curve too). Accumulates, across every task that ends
    * while a probe runs, the MAX per-task `peakExecutionMemory` (the
    * number that decides whether a fixed-size executor OOMs as data
    * scales — aggregate/join/sort hash structures, not cached blocks)
    * and the SUM of memory+disk spill bytes (the number that says the
    * operator degraded to spilling instead). Listener events post
    * asynchronously; [[settle]]'s bounded sleep lets the tail drain —
    * a probe row is seconds-scale, so the residual undercount risk is
    * noise (documented, not hidden). */
  private class MemProbeListener extends org.apache.spark.scheduler.SparkListener {
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val spill = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        peak.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { peak.set(0L); spill.set(0L) }
    def settle(): Unit = Thread.sleep(300)
  }

  /** r20: the integer-exact ANN family laddered against its float
    * siblings — the replayability-cost question asked at scale: both
    * families are bucket-join shaped (build = bounded-sample k-means,
    * query = nprobe/nlist of the corpus or an m-lookup ADC scan), so
    * the cells should track each other within the kernel-parity band
    * the r20 solo A/Bs measured, and a DIVERGING slope would mean the
    * integer form hides a volume term the float form doesn't pay.
    * Queries are the 100 lowest base vec_ids at every cell (fixed
    * query batch, growing corpus — the production read shape). */
  private def annIntProbe(spark: org.apache.spark.sql.SparkSession,
                          dir: String, scales: Seq[Int], cpus: Int): Unit = {
    import spark.implicits._
    import graft.operators.{Similarity, SimilarityInt}
    scales.foreach { s =>
      ops.Memo.clear(spark)
      val emb = scaledEmbeddings(spark, dir, s).repartition(cpus * 2).cache()
      val n = emb.count()
      val queries = emb.filter($"vec_id" < 100)
      val z = SimilarityInt.zCodes(emb).cache()
      z.count()
      val zq = z.filter($"vid" < 100)
      println(s"== ann-int ${s}x: $n vectors")
      val probes: Seq[(String, () => Long)] = Seq(
        "ivf_float" -> (() =>
          Similarity.ivfTopK(emb, queries, k = 10, nlist = 128,
            nprobe = 16, lloydIters = 2).count()),
        "ivf_int" -> (() => {
          val idx = SimilarityInt.ivfBuildInt(z, nlist = 128, iters = 2,
            seed = 42L, memoKey = s"sp:ivfint:$s")
          SimilarityInt.ivfTopKInt(idx, zq, z, k = 10, nprobe = 16).count()
        }),
        "pq_float" -> (() => {
          val cb = Similarity.pqTrain(emb, m = 8, ksub = 16, lloydIters = 2)
          Similarity.pqTopK(Similarity.pqEncode(emb, cb), cb, emb,
            queries, k = 10, rerank = 50).count()
        }),
        "pq_int" -> (() => {
          val cb = SimilarityInt.pqTrainInt(z, m = 8, ksub = 16, iters = 2,
            seed = 42L, memoKey = s"sp:pqint:$s")
          SimilarityInt.pqTopKInt(SimilarityInt.pqEncodeInt(z, cb), cb, z,
            zq, k = 10, rerank = 50).count()
        }),
        "ivfpq_float" -> (() => {
          val idx = Similarity.ivfPqBuild(emb, nlist = 64, m = 8,
            ksub = 16, lloydIters = 2)
          Similarity.ivfPqTopK(idx, queries, emb, k = 10, nprobe = 16,
            rerank = 50).count()
        }),
        "ivfpq_int" -> (() => {
          val idx = SimilarityInt.ivfPqBuildInt(z, nlist = 64, m = 8,
            ksub = 16, iters = 2, seed = 42L, memoKey = s"sp:ivfpqint:$s")
          SimilarityInt.ivfPqTopKInt(idx, zq, z, k = 10, nprobe = 16,
            rerank = 50).count()
        }))
      probes.foreach { case (nm, f) =>
        val (c, t) = timeIt(f())
        println(f"  $nm%-12s $t%7.2f s  rows=$c%d")
      }
      emb.unpersist(); z.unpersist()
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    // SPARK_GRAFT_PROBE_SHUFFLE overrides the shuffle-partition count —
    // added to TEST whether the r17 memory axis's two spilling cells
    // (q150 sign-band, q127) were an undersized-partition artifact.
    // MEASURED ANSWER: no — at 512 partitions the 16× cells spill MORE
    // (q150 5.6 → 12.7 GB, 21.5 → 78.6 s; q127 3.7 → 4.1 GB), because
    // the spill is the self-join's sort volume (data-inherent at the
    // capped dial), not per-partition aggregate size, and extra tasks
    // just multiply sort runs. The production mitigation is the
    // operator handoff (SRP form: zero spill at the same cell), not a
    // partition dial. The knob stays for future regime experiments.
    val probeShuffle = sys.env.get("SPARK_GRAFT_PROBE_SHUFFLE")
      .map(_.toInt).getOrElse(cpus)
    val spark = GraftSession.create(appName = "graft-scale-probe",
      master = s"local[$cpus]", shufflePartitions = Some(probeShuffle))
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("bpe")) {
      val ms = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
               else Seq(16, 64, 256)
      bpeProbe(spark, dir, ms)
      spark.stop()
      return
    }
    if (args.headOption.contains("entities")) {
      entityTailProbe(spark, dir)
      spark.stop()
      return
    }
    if (args.headOption.contains("psl")) {
      pslProbe(spark, dir, if (args.length > 1) args(1).toInt else 15000)
      spark.stop()
      return
    }
    if (args.headOption.contains("archive")) {
      archiveProbe(spark, dir, if (args.length > 1) args(1).toInt else 16)
      spark.stop()
      return
    }
    if (args.headOption.contains("archive-latency")) {
      archiveLatencyProbe(spark,
        if (args.length > 1) args(1).toInt else 10000,
        if (args.length > 2) args(2).toLong else 20L)
      spark.stop()
      return
    }
    if (args.headOption.contains("kcore-split")) {
      // r18: attribute q198's bench cost — the bipartite projection's
      // meet volume vs the 6 synchronous peel rounds. Run at the dir
      // in SPARK_GRAFT_SF_DIR; each leg timed cold (fresh frames, no
      // memo) then the full pipeline as the bench runs it (memoized
      // edges, so the rounds reuse one materialization).
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val (nPairs, tProj) = timeIt {
        ops.EventQueries.coEngagementEdges(ev, minShared = 22L).count()
      }
      val e = ops.Memo.of(spark, s"kcsplit_edges:$dir") {
        ops.EventQueries.coEngagementEdges(ev, minShared = 22L)
      }
      val (_, tMat) = timeIt { e.count() } // memo materialization
      val (nCore, tPeel) = timeIt {
        ops.TextQueries.kCore(e, k = 70, iters = 6).count()
      }
      println(f"kcore-split @ $dir: projection $nPairs%d directed rows " +
        f"in $tProj%.2f s; memo materialize $tMat%.2f s; " +
        f"6 peel rounds over the memo -> $nCore%d core rows in $tPeel%.2f s")
      spark.stop()
      return
    }
    if (args.headOption.contains("bpe-local")) {
      val nWords = if (args.length > 1) args(1).toInt else 60000
      val ms = if (args.length > 2) args.drop(2).toSeq.map(_.toInt)
               else Seq(1000, 8000, 30000)
      bpeLocalProbe(spark, nWords, ms)
      spark.stop()
      return
    }
    if (args.headOption.contains("ann-int")) {
      val scales = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
                   else Seq(1, 4, 16)
      annIntProbe(spark, dir, scales, cpus)
      spark.stop()
      return
    }
    val scales = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)
    import spark.implicits._

    scales.foreach { s =>
      val docs = scaledDocs(spark, dir, s)
        .repartition(cpus * 2).cache()
      val emb = scaledEmbeddings(spark, dir, s)
        .repartition(cpus * 2).cache()
      val nd = docs.count(); val ne = emb.count()
      val queries = emb.filter($"vec_id" < 100)
      println(s"== scale ${s}x: $nd docs, $ne vectors")

      val probes: Seq[(String, () => Long)] = Seq(
        "q33_exact_dedup" -> (() => operators.Dedup.exactDedup(docs).count()),
        "q35_minhash_pairs" -> (() =>
          operators.Dedup.minHashPairs(docs, k = 3, numHashes = 16,
            threshold = 0.6).count()),
        "q36_simhash_pairs" -> (() =>
          operators.Dedup.simHashPairs(docs, maxHamming = 6).count()),
        "q39_dedup_clusters" -> (() =>
          operators.Dedup.connectedComponents(
            operators.Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.6)
              .select($"d1", $"d2")).count()),
        "q49_dedup_corpus" -> (() =>
          operators.Dedup.dedupCorpus(docs).count()),
        // r18: the prefix-filtered EXACT pair engine next to its
        // naive sibling (q39's ngramJaccardPairs cell above) — the
        // scale claim is that candidate volume tracks RARE-shingle
        // df, not total df, so the ladder carries the verified pair
        // count, the admitted candidate count, AND the naive
        // inverted index's meet volume Σ f·(f−1)/2 (the floor the
        // naive self-join is forced to): the candidate/meet ratio is
        // the filter's measured pruning power per scale step
        // r19: the robots decision join over page VOLUME — the
        // stream-static shape (per-host rule arrays broadcast, pages
        // flow through a per-row argmax; wildcard rules take the LIKE
        // path, plain rules the startsWith fast path). The cell's
        // claim is linearity: no aggregation over page volume exists,
        // so time should track the page count and nothing else. The
        // aggregate reads `allowed` ON PURPOSE — a bare count() lets
        // column pruning delete the whole match pipeline (measured:
        // 20M pages "decided" in 0.57 s via count vs 25.8 s forced —
        // the probe would time a row counter, not the operator).
        "q200_robots_decide" -> (() => {
          val rules = operators.Domains.robotsParse(
            spark.range(7).select(
              concat(lit("h"), $"id".cast("string"), lit(".example.org"))
                .as("host"),
              concat(lit("User-agent: *\nAllow: /\nDisallow: /p/\n"),
                lit("Allow: /p/1\nDisallow: /p/*9$\nAllow: /p/*99$\n"))
                .as("robots_txt")))
          val pages = docs.select($"doc_id",
            concat(lit("http://h"), pmod($"doc_id", lit(7)).cast("string"),
              lit(".example.org/p/"), $"doc_id".cast("string")).as("url"))
          operators.Domains.robotsDecision(pages, rules)
            .agg(sum(when($"allowed", 1L).otherwise(0L))).as[Long]
            .collect()(0)
        }),
        "q197_prefix_jaccard" -> (() =>
          operators.Dedup.prefixJaccardPairs(docs, k = 3,
            thresholdPermille = 500L).count()),
        "q197_candidates" -> (() =>
          operators.Dedup.prefixCandidates(docs, k = 3,
            thresholdPermille = 500L).count()),
        "q34_meet_volume" -> (() => {
          graft.functions.ShingleHashes.register(spark)
          docs.withColumn("fh", expr("shingle_hashes(text, 3)"))
            .select(explode($"fh").as("sh"))
            .groupBy("sh").agg(count(lit(1)).as("f"))
            .agg(coalesce(sum(expr("f * (f - 1) div 2")), lit(0L))
              .as("m"))
            .as[Long].collect()(0)
        }),
        // r18: k-core peel over the user co-engagement projection —
        // copies get DISJOINT key spaces (k shifted per copy) so the
        // graph is s disjoint copies and the probe measures the
        // projection + 6 peel rounds' engine overhead, not the
        // quadratic densification shared keys would cause (that
        // regime is what coEngagementEdges' maxUsersPerKey caps).
        // The edge frame is MATERIALIZED before the peel, exactly as
        // q198 memoizes it — the first ladder run skipped this and
        // paid the projection SIX times (one per round's lineage;
        // 211 s at 1x where the memoized form costs ~19 s): the same
        // carried-frame lesson as kCore's one-reference round, at the
        // caching layer instead of the plan layer
        "q198_kcore" -> (() => {
          val ev = Tables.events(spark, dir).select($"user_id", $"props")
          val scaled = (0 until s).map { i =>
            if (i == 0) ev
            else ev.select(($"user_id" + lit(i * 1000000L)).as("user_id"),
              concat(lit("{\"k\": "),
                (expr("cast(get_json_object(props, '$.k') as bigint)")
                  + lit(i * 1000L)).cast("string"),
                lit("}")).as("props"))
          }.reduce(_ unionByName _).repartition(cpus * 2)
          val e = ops.EventQueries.coEngagementEdges(scaled, minShared = 22L)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            e.count()
            ops.TextQueries.kCore(e, k = 70, iters = 6).count()
          } finally { e.unpersist() }
        }),
        // r18: the full decomposition over the same scaled graph —
        // 12 h-index rounds, each one join + a degree-bounded rank
        // window + a combinable max; per-round volume tracks |edges|,
        // so the cell's slope should match q198's peel, not its
        // projection (which the persist isolates here too)
        "q201_coreness" -> (() => {
          val ev = Tables.events(spark, dir).select($"user_id", $"props")
          val scaled = (0 until s).map { i =>
            if (i == 0) ev
            else ev.select(($"user_id" + lit(i * 1000000L)).as("user_id"),
              concat(lit("{\"k\": "),
                (expr("cast(get_json_object(props, '$.k') as bigint)")
                  + lit(i * 1000L)).cast("string"),
                lit("}")).as("props"))
          }.reduce(_ unionByName _).repartition(cpus * 2)
          val e = ops.EventQueries.coEngagementEdges(scaled, minShared = 22L)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            e.count()
            ops.TextQueries.coreness(e, iters = 12).count()
          } finally { e.unpersist() }
        }),
        // r18: the truss peel on its thinner (shared>=32) projection —
        // kTruss checkpoints internally per round, so the cell only
        // isolates the projection the same way the query's memo does
        "q202_ktruss" -> (() => {
          val ev = Tables.events(spark, dir).select($"user_id", $"props")
          val scaled = (0 until s).map { i =>
            if (i == 0) ev
            else ev.select(($"user_id" + lit(i * 1000000L)).as("user_id"),
              concat(lit("{\"k\": "),
                (expr("cast(get_json_object(props, '$.k') as bigint)")
                  + lit(i * 1000L)).cast("string"),
                lit("}")).as("props"))
          }.reduce(_ unionByName _).repartition(cpus * 2)
          val e = ops.EventQueries.coEngagementEdges(scaled, minShared = 32L)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            e.count()
            ops.TextQueries.kTruss(e, k = 6, iters = 7).count()
          } finally { e.unpersist() }
        }),
        "q41_ann_topk" -> (() =>
          operators.Similarity.annTopK(emb, queries, k = 10).count()),
        "q43_ann_ivf" -> (() =>
          operators.Similarity.ivfTopK(emb, queries, k = 10).count()),
        // substream valve engaged: the probe's copies all share one
        // doc_id range per source, the skew shape the valve exists for
        "q71_pack_sequences" -> (() =>
          operators.Sharding.packSequences(docs, seqLen = 64,
            substreamDocs = Some(10000L)).count()),
        "q72_bm25_topk" -> (() =>
          operators.TextAnalysis.bm25TopK(docs,
            Seq("spark", "join", "window"), k = 10).count()),
        "q81_semantic_dedup" -> (() =>
          operators.Similarity.semanticDedup(emb).count()),
        "q82_passage_prune" -> (() =>
          operators.TextAnalysis.prunePassages(docs, chunkTokens = 32).count()),
        // r7: the capped co-occurrence edge build — per-doc top-16
        // terms bound every doc at ≤ 240 directed edges, so edge
        // volume scales with DOCS, not with length² (the r6 shape's
        // pathology); content-unique copies keep vocabularies disjoint
        "q101_pr_edges" -> (() =>
          ops.TextQueries.coOccurrenceEdges(docs,
            ops.TextQueries.PageRankMaxTermsPerDoc).count()),
        // r7: linear-shuffle substring dedup — window rows ∝ corpus
        // tokens (never pairs), so time should track data volume;
        // content-unique copies add zero cross-copy matches
        "q106_dup_spans" -> (() =>
          operators.TextAnalysis.dupSpans(docs, windowTokens = 15).count()),
        // r7: integer power iteration — per iteration one scan + a
        // d-row aggregate, so time ∝ n·d with a fixed job count
        "q107_power_iteration" -> (() =>
          operators.Spectral.dominantProjection(emb, iterations = 2).count()),
        // r16: two-component PCA — the q107 loop plus an exact integer
        // deflation and a second loop over the deflated matrix: the
        // job COUNT is fixed per scale step and every round is one
        // scan + a d-row aggregate, so time ∝ n·d like q107's
        "q109_pca2" -> (() =>
          operators.Spectral.pca2Projection(emb, iterations = 2).count()),
        // r16: the both-gates ingest form (Jaccard OR containment) —
        // q62's delta frame with one extra integer predicate on the
        // already-aggregated pair stats, so the scaling shape must
        // match q62's (any divergence is a bug in the containment arm)
        "q135_delta_containment" -> (() =>
          operators.Dedup.deltaDedup(
            docs.filter(pmod($"doc_id", lit(5)) =!= 0),
            docs.filter(pmod($"doc_id", lit(5)) === 0),
            k = 3, threshold = 0.6, releaseEagerly = false,
            containmentPermille = Some(250L)).count()),
        // r16: cross-lingual semantic pairs — the q81 sign-band
        // self-join + integer cosine gate generates candidates (ids
        // only through the join); languages attach per-row to the
        // GATED pair frame (tiny), so the probe measures the
        // candidate path's slope, the scale-bearing stage.
        // DIRECTION-unique copies, not scaledEmbeddings' additive
        // ±0.5 offsets: under the SEMANTIC gate an additive nudge
        // leaves cross-copy cosines ≈ 0.87, every copy of a base
        // vector near-dups every other copy, and the pair OUTPUT
        // grows ∝ copies² (measured: 237 → 91M rows at 16×, a
        // fixture artifact — the pair frame is Θ(Σ cluster²) by
        // CONTRACT; see ARCHITECTURE §headroom megacluster note).
        // Replacing copies' vectors with fresh deterministic
        // directions keeps clusters inside one copy, so the probe
        // measures the candidate path, not output volume.
        "q150_crosslingual" -> (() => {
          val base = Tables.embeddings(spark, dir)
            .select("vec_id", "embedding")
          // hash-based white noise, NOT sin of linearly-shifted
          // arguments: sin(x + c·i) keeps cos(c)-level correlation
          // between copies (measured: the first fix still emitted
          // 65M pairs at 16× — cos(37 rad) ≈ 0.77), while sin of a
          // 64-bit hash is effectively uniform noise per (vec, dim,
          // copy) and cross-copy cosines concentrate at ~1/√d
          val uniq = (0 until s).map { i =>
            if (i == 0) base
            else base.select(
              ($"vec_id" + lit(i * 10000000L)).as("vec_id"),
              expr(s"transform(embedding, (x, j) -> " +
                s"float(sin(xxhash64(vec_id * 1048573 + j * 101 + $i))))")
                .as("embedding"))
          }.reduce(_ unionByName _).repartition(cpus * 2)
          // the documented dial: bandBits grows with corpus size to
          // hold candidate share (occupancy ≈ n/2^bits per band);
          // 8 bands × 8 bits = 64 is the fixture's DIM CEILING — the
          // sign-band family reads raw dimension signs, so past this
          // n the production handoff is SRP buckets (decoupled bit
          // width) or IVF blocking; the 16× cell measures the capped
          // regime on purpose (see ARCHITECTURE §headroom)
          val bb = if (s >= 4) 8 else 6
          val pairs = operators.Similarity.semanticNearDupPairs(uniq,
            bands = 8, bandBits = bb, simNumSqE4 = 2025L)
          pairs
            .withColumn("lang1", concat(lit("l"), pmod(hash($"d1"), lit(5))))
            .withColumn("lang2", concat(lit("l"), pmod(hash($"d2"), lit(5))))
            .filter($"lang1" =!= $"lang2").count()
        }),
        // r16: the PAST-the-ceiling form — SRP hyperplane buckets
        // decouple bit width from dimension, so the dial keeps
        // scaling (bits + 2 per 4× data holds candidate share
        // constant) where the sign family capped at 8×8 = d = 64
        "q150srp_pairs" -> (() => {
          val base = Tables.embeddings(spark, dir)
            .select("vec_id", "embedding")
          val uniq = (0 until s).map { i =>
            if (i == 0) base
            else base.select(
              ($"vec_id" + lit(i * 10000000L)).as("vec_id"),
              expr(s"transform(embedding, (x, j) -> " +
                s"float(sin(xxhash64(vec_id * 1048573 + j * 101 + $i))))")
                .as("embedding"))
          }.reduce(_ unionByName _).repartition(cpus * 2)
          // srpBitsFor IS the ladder progression (12→14→16 at
          // 1×/4×/16×); the 64× cell holds the 16 ceiling on purpose
          // (the measured ceiling-held regime — ARCHITECTURE ladder)
          val bits = math.min(16,
            operators.Similarity.srpBitsFor(2000L * s, tables = 8))
          operators.Similarity.semanticNearDupPairsSrp(uniq,
            tables = 8, bits = bits, seed = 2025L,
            simNumSqE4 = 2025L).count()
        }),
        // r18: the q150 shape through the AUTOMATIC handoff
        // (semanticNearDupPairsAuto): below the dim ceiling the route
        // is the sign-band form at the occupancy-holding bandBits
        // (1×/4× → the same 6/8 dials the manual cells run); at 16×
        // the ceiling binds and the route flips to SRP — the cell
        // exists to measure that the AUTOMATIC path inherits SRP's
        // zero spill exactly where the capped sign form spills 5.6 GB
        "q150auto_pairs" -> (() => {
          val base = Tables.embeddings(spark, dir)
            .select("vec_id", "embedding")
          val uniq = (0 until s).map { i =>
            if (i == 0) base
            else base.select(
              ($"vec_id" + lit(i * 10000000L)).as("vec_id"),
              expr(s"transform(embedding, (x, j) -> " +
                s"float(sin(xxhash64(vec_id * 1048573 + j * 101 + $i))))")
                .as("embedding"))
          }.reduce(_ unionByName _).repartition(cpus * 2)
          val pairs = operators.Similarity.semanticNearDupPairsAuto(uniq,
            bands = 8, simNumSqE4 = 2025L, nOpt = Some(2000L * s))
          pairs
            .withColumn("lang1", concat(lit("l"), pmod(hash($"d1"), lit(5))))
            .withColumn("lang2", concat(lit("l"), pmod(hash($"d2"), lit(5))))
            .filter($"lang1" =!= $"lang2").count()
        }),
        // r7 widening: prefix blocking — content-unique copies change
        // every token, so blocks never span copies and pair work
        // scales with docs, not docs²
        "q111_edit_pairs" -> (() =>
          ops.TextQueries.editDistancePairs(docs).count()),
        // r7 widening: two combinable aggregates, linear by shape
        "q112_diversity" -> (() =>
          ops.TextQueries.tokenDiversity(docs).count()),
        // r7 widening: two-stage skyline over synthetic orders (the
        // fixture's orders table doesn't scale with the docs copies):
        // hash-dated/priced rows, 100k per scale step — stage 1 is a
        // partitioned window, stage 2 sees only Σ per-month frontiers
        "q110_skyline" -> (() => {
          val synth = spark.range(100000L * s).select(
            $"id".as("o_orderkey"),
            to_timestamp(date_add(lit("1992-01-01").cast("date"),
              pmod(hash($"id"), lit(2557)).cast("int"))).as("o_orderdate"),
            pmod(hash($"id" * 7), lit(1000000)).cast("double").as("o_totalprice"))
          ops.Relational.skylineFrontier(synth).count()
        }),
        // r7 widening: triangle census over the capped co-occurrence
        // graph — content-unique copies keep vocabularies disjoint, so
        // the graph is s disjoint copies and triangle work scales with
        // components; degree orientation keeps wedge volume O(m^1.5)
        // even on the hub-heavy shared-vocabulary shape
        "q118_triangles" -> (() =>
          ops.TextQueries.triangleCensus(
            ops.TextQueries.coOccurrenceEdges(docs,
              ops.TextQueries.PageRankMaxTermsPerDoc))
            .select($"n_triangles").as[Long].collect()(0)),
        // r8 widening: inverted index — explode + combinable count +
        // k-capped native head aggregate: every buffer ≤ 40 ids at
        // every stage whatever a term's df, so time ∝ tokens and no
        // hot-term task exists
        "q123_inverted_index" -> (() =>
          operators.TextAnalysis.invertedIndex(docs, minDf = 3, postingCap = 40).count()),
        // r8 widening (r9 shape): PMI — the same top-16 cap as q101
        // bounds pair fan-out at C(16,2) per doc, emitted by the
        // in-row sorted-array expansion (no positional self-join), so
        // candidate volume ∝ docs; disjoint copy vocabularies keep
        // the pair space from fusing
        "q124_pmi_pairs" -> (() => {
          val tf = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
            .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          val t = tf.withColumn("rk", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
                .orderBy($"tf".desc, $"term")))
            .filter($"rk" <= ops.TextQueries.PageRankMaxTermsPerDoc)
            .select("doc_id", "term")
          t.groupBy("doc_id")
            .agg(sort_array(collect_list($"term")).as("ts"))
            .select(explode(expr(
              "flatten(transform(ts, (x, i) -> " +
                "transform(slice(ts, i + 2, size(ts)), y -> struct(x, y))))")).as("p"))
            .groupBy(col("p.x"), col("p.y")).agg(count(lit(1)).as("n12"))
            .filter($"n12" >= 3).count()
        }),
        // r9: incremental dedup over the %5 split of the scaled corpus
        // — the cross-side join's volume rides the DELTA (1/5 of
        // docs), and content-unique copies add no cross-copy pairs,
        // so time ∝ docs
        "q62_delta_dedup" -> (() =>
          operators.Dedup.deltaDedup(
            docs.filter(pmod($"doc_id", lit(5)) =!= 0),
            docs.filter(pmod($"doc_id", lit(5)) === 0),
            k = 3, threshold = 0.6, releaseEagerly = false).count()),
        // r9: banded hash near-dup — cluster width pinned at ~16 docs
        // whatever the scale (cluster id = doc_id div 16 within each
        // copy's id range), so the planted pair OUTPUT grows linearly
        // with docs and the probe measures band-join overhead, not
        // clique growth; bands=8 > maxHamming=4 keeps recall exact.
        // The splitmix-style grid ([[ops.EventQueries.clusterGridSql]])
        // is load-bearing: an affine grid collapsed 50k docs onto
        // 2.5k hashes and 68M pairs — output growth, not engine time
        "q136_hash_near_dup" -> (() => {
          graft.functions.AHash64Gray.register(spark)
          val grid = ops.EventQueries.clusterGridSql(
            "doc_id div 16", "pmod(doc_id, 64)")
          val hashed = docs.select($"doc_id".as("asset_id"),
            expr(s"ahash64_gray($grid)").as("ahash"))
          operators.Multimodal.hashNearDupPairs(hashed,
            maxHamming = 4, bands = 8, keyBands = 2).count()
        }),
        // r11: AUDIO near-dup — identical slice-key machinery over the
        // energy-gradient hash; the cluster-envelope regime plants
        // linear pair output exactly like q136's image grid, so the
        // row measures band-join overhead on a second hash family
        "q137_audio_near_dup" -> (() => {
          graft.functions.EHash64Energy.register(spark)
          val env = ops.EventQueries.clusterEnvelopeSql(
            "doc_id div 16", "pmod(doc_id, 64)")
          val hashed = docs.select($"doc_id".as("asset_id"),
            expr(s"ehash64_energy($env)").as("ahash"))
          operators.Multimodal.hashNearDupPairs(hashed,
            maxHamming = 4, bands = 8, keyBands = 2).count()
        }),
        // r11: the multimodal INGEST front door at scale — binary
        // payloads (text bytes behind real container magic numbers)
        // through media_type sniff + route; per-row constant-time
        // prefix inspection, one small-group aggregate, no shuffle of
        // payload bytes
        "q53_media_route" -> (() => {
          val assets = docs.select($"doc_id".as("asset_id"),
            expr("concat(element_at(array(" +
              "X'89504E470D0A1A0A', X'FFD8FFE0', X'1F8B0800', X'0000'), " +
              "cast(pmod(doc_id, 4) + 1 as int)), encode(text, 'UTF-8'))")
              .as("payload"))
          operators.Multimodal.routeByType(assets)
            .groupBy($"route").agg(count(lit(1))).count()
        }),
        // r8 widening: containment rides the identical inverted-index
        // self-join as ngramJaccardPairs (one undirected aggregate,
        // direction split on the pair frame) — content-unique copies
        // add zero cross-copy candidates, so time ∝ docs
        "q127_containment" -> (() =>
          operators.Dedup.containmentPairs(docs, k = 3).count()),
        // r18 A/B (VERDICT r17 item 6): the same containment pipeline
        // with a SHUFFLE_HASH hint on the inverted-index self-join —
        // the 16× cell's 3.7 GB spill is sort volume, and a shuffled
        // hash join has no sort to spill; the memory axis shows
        // whether the hash build trades spill for peak task memory.
        // Inlined rather than a containmentPairs dial so the
        // experiment can't leak into the oracle-gated operator before
        // the verdict is in.
        "q127shj_containment" -> (() => {
          graft.functions.ShingleHashes.register(spark)
          val sh = docs
            .withColumn("fh", expr("shingle_hashes(text, 3)"))
            .filter(size($"fh") > 0)
            .select($"doc_id", size($"fh").cast("long").as("ns"),
              explode($"fh").as("shingle"))
          val und = sh.as("a").hint("SHUFFLE_HASH")
            .join(sh.as("b"),
              col("a.shingle") === col("b.shingle") &&
                col("a.doc_id") < col("b.doc_id"))
            .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
            .agg(count(lit(1)).as("common"),
              max(col("a.ns")).as("n1"), max(col("b.ns")).as("n2"))
          und.select(col("d1").as("contained"), col("common"),
              col("n1").as("n_contained"))
            .unionAll(und.select(col("d2").as("contained"), col("common"),
              col("n2").as("n_contained")))
            .withColumn("cont_permille", expr("common * 1000 div n_contained"))
            .filter(col("n_contained") >= 10 && col("cont_permille") >= 800)
            .count()
        }),
        // r8 widening: bigram LM — one per-row list transform + two
        // combinable counts; no positional self-join anywhere
        "q128_bigram_lm" -> (() => {
          val bi = docs.select(split($"text", " ").as("w"))
            .filter(size($"w") >= 2)
            .select(explode(expr(
              "transform(sequence(0, size(w) - 2), i -> " +
                "named_struct('w1', element_at(w, i + 1), 'w2', element_at(w, i + 2)))"))
              .as("b"))
          bi.groupBy(col("b.w1"), col("b.w2")).agg(count(lit(1)).as("c12"))
            .filter($"c12" >= 3).count()
        }),
        // r8 widening: histogram sketch — each partition reduces to
        // ≤ 128 counters per group before the (tiny) shuffle; synth
        // events because the fixture's events don't scale with copies
        "q129_hist_sketch" -> (() => {
          val synth = spark.range(100000L * s).select(
            concat(lit("t"), pmod(hash($"id"), lit(8))).as("event_type"),
            pmod(hash($"id" * 17), lit(1000000)).cast("long").as("c"))
          val rng = synth.groupBy("event_type").agg(
            min($"c").as("mn"), max($"c").as("mx"), count(lit(1)).as("n"))
          synth.join(broadcast(rng), "event_type")
            .withColumn("bin", expr("((c - mn) * 128) div (mx - mn + 1)"))
            .groupBy($"event_type", $"bin").agg(count(lit(1)).as("bc"))
            .count()
        }),
        // r9 depth: LM scoring — model build is two combinable counts,
        // the scoring join shuffles model cardinality + the per-doc
        // bigram stream, both ∝ tokens; content-unique copies multiply
        // the model's vocabulary linearly (each copy's model is
        // disjoint), the worst case for the join's build side
        "q151_lm_score" -> (() =>
          operators.TextAnalysis.lmMeanScore(docs,
            operators.TextAnalysis.bigramModel(docs)).count()),
        // r9 depth: OOV audit — token explode + combinable count +
        // top-1000 TakeOrdered + broadcast membership join at scan
        // parallelism; time ∝ tokens, no token-volume shuffle
        "q154_oov_rate" -> (() =>
          operators.TextAnalysis.oovRate(
            docs.withColumn("lang",
              concat(lit("l"), pmod(hash($"doc_id"), lit(5)))),
            vocabSize = 1000).count()),
        // r9 depth: path trigrams over synth sessions (fixture events
        // don't scale with copies) — ~100 events per user keeps the
        // per-session collect bounded while user count scales; the
        // whole chain is the one user_id exchange
        "q152_path_trigrams" -> (() => {
          // each user owns a contiguous 100-event block 1 s apart ->
          // one ~100-event session per user: session size stays
          // bounded while USER count scales with the data
          val synth = spark.range(100000L * s).select(
            $"id".as("event_id"),
            expr("timestamp_micros(id * 1000000)").as("ts"),
            expr("id div 100").as("user_id"),
            concat(lit("t"), pmod(hash($"id" * 7), lit(8))).as("event_type"))
          ops.EventQueries.pathTrigrams(synth).count()
        }),
        // r9 depth: audience overlap — the self-joined frame is the
        // distinct (type, user) projection: ≤ 8 rows per user whatever
        // the event volume, so pair fan-out ∝ users · C(8,2)
        "q155_audience_overlap" -> (() => {
          val synth = spark.range(100000L * s).select(
            concat(lit("t"), pmod(hash($"id" * 7), lit(8))).as("event_type"),
            pmod(hash($"id"), lit(1000L * s)).as("user_id"))
          ops.EventQueries.audienceOverlap(synth).count()
        }),
        // r8 widening: skew audit — the rank window sorts |keys| rows
        // (synthetic zipf-ish keys, 100k·s events over ~√ that many
        // keys), never the event rows themselves
        // r9 retrieval closers: both are scan-bound by construction —
        // the phrase/term derivation is a corpus-token-volume count,
        // the match stage moves only candidate votes (content-unique
        // copies keep the derived phrase/terms inside one copy, so
        // output stays ~flat while the scanned volume grows: the probe
        // measures the scan-stage slope, which is the scale claim)
        "q163_phrase_search" -> (() =>
          ops.TextQueries.phraseSearch(docs).count()),
        // slots pinned from the UNSCALED corpus: the scaled copies'
        // suffixed tokens tie in count, and a term-asc tiebreak over
        // ties picks three terms from three different copies — which
        // co-occur nowhere and would probe an empty match stage
        "q165_proximity_search" -> (() => {
          val base = Tables.documents(spark, dir)
          val slots = base
            .select(explode(split($"text", " ")).as("term"))
            .groupBy("term").agg(count(lit(1)).as("n"))
            .orderBy($"n".desc, $"term".asc).limit(3)
            .withColumn("slot",
              (row_number().over(org.apache.spark.sql.expressions.Window
                .orderBy($"n".desc, $"term".asc)) - 1).cast("int"))
            .select($"slot", $"term")
          operators.TextAnalysis.proximityMinSpan(docs, slots, k = 16).count()
        }),
        // r17: HLL distinct user-days shape — one bounded two-level
        // aggregate (register table ≤ m rows per group at EVERY cell:
        // state constant in corpus size, the whole point), so time ∝
        // rows scanned, exactly linear by shape
        "q191_hll" -> (() =>
          operators.Sketches.hllDistinctEstimate(
            docs.select($"doc_id", $"source"), "source",
            "cast(doc_id as string)").count()),
        // r17: Bloom decontamination pre-filter — the bench set (src0
        // shingles) grows WITH the corpus here, so this measures both
        // the bit_or build (∝ bench shingles) and the shuffle-free
        // probe (∝ corpus shingles, broadcast lookups + one per-doc
        // aggregate); the bitmap stays 2¹⁷ bits at every cell (probe
        // state constant — production scales mBits ∝ n to hold FPR,
        // same recipe as srpBitsFor)
        "q193_bloom_prefilter" -> (() => {
          val sh = docs
            .select($"doc_id", $"source", split($"text", " ").as("w"))
            .filter(size($"w") >= 3)
            .select($"doc_id", $"source",
              explode(array_distinct(expr(
                "transform(sequence(0, size(w) - 3), " +
                  "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")))
                .as("shingle"))
          val bits = operators.Sketches.bloomBits(
            sh.filter($"source" === "src0").select("shingle"), "shingle")
          operators.Sketches.bloomMaybe(
              sh.filter($"source" =!= "src0").select("doc_id", "shingle"),
              "shingle", bits, carry = Seq("doc_id"))
            .groupBy("doc_id")
            .agg(sum(when($"maybe", 1L).otherwise(0L)).as("n_maybe"))
            .count()
        }),
        // r18: the regime-routed estimators, laddered on arrival.
        // Two-regime fixture at scale: "big:" groups' key cardinality
        // grows with the copies (content-unique doc ids), "small:"
        // groups stay pinned at <= 40 keys — so the route SPLIT holds
        // at every cell while the input volume scales. Both sketches
        // are bounded combinable aggregates; the expectation the cell
        // certifies is flat memory and sub-linear time.
        "q195_adaptive_distinct" -> (() => {
          val src = docs.select(concat(lit("big:"), $"source").as("grp"),
              $"doc_id".cast("string").as("key"))
            .unionByName(docs.select(
              concat(lit("small:"), $"source").as("grp"),
              pmod($"doc_id", lit(40)).cast("string").as("key")))
          operators.Sketches.adaptiveDistinct(src, "grp", "key").count()
        }),
        "q196_adaptive_pairs" -> (() => {
          val src = docs.select(concat(lit("big:"), $"source").as("grp"),
              $"doc_id".cast("string").as("key"))
            .unionByName(docs.select(
              concat(lit("small:"), $"source").as("grp"),
              pmod($"doc_id", lit(40)).cast("string").as("key")))
          operators.Sketches.adaptivePairAlgebra(src, "grp", "key").count()
        }),
        "q121_key_skew" -> (() => {
          val synth = spark.range(100000L * s).select(
            (pmod(hash($"id"), lit(1000)) *
              pmod(hash($"id" * 13), lit(320))).as("k"))
          val counts = synth.groupBy($"k").agg(count(lit(1)).as("x"))
          val w = org.apache.spark.sql.expressions.Window.orderBy($"x", $"k")
          counts.withColumn("i", row_number().over(w).cast("long"))
            .agg(count(lit(1)).as("n_keys"), sum($"i" * $"x").as("wsum"))
            .select($"n_keys").as[Long].collect()(0)
        }))

      // dev convenience mirroring Bench's: SPARK_GRAFT_PROBE_ONLY=q163,...
      // probes a subset for targeted iteration; unset runs all
      val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
        .map(_.split(",").map(_.trim).toSet)
      // the memory axis (one probe flag: SPARK_GRAFT_PROBE_MEM=1) —
      // per-cell max task peakExecutionMemory + total spill bytes
      val memL =
        if (sys.env.get("SPARK_GRAFT_PROBE_MEM").contains("1")) {
          val l = new MemProbeListener
          spark.sparkContext.addSparkListener(l)
          Some(l)
        } else None
      val rows = probes
        .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
        .map { case (name, f) =>
        memL.foreach(_.reset())
        val (n, sec) = timeIt(f())
        val mem = memL.map { l =>
          l.settle()
          (l.peak.get() / (1024.0 * 1024.0),
            l.spill.get() / (1024.0 * 1024.0))
        }
        val memTxt = mem.map { case (p, sp) =>
          f"   peak-task-mem $p%7.1f MiB  spill $sp%7.1f MiB" }.getOrElse("")
        println(f"$name%-22s $sec%8.2f s   (rows=$n)$memTxt")
        s""""$name":{"sec":${math.round(sec * 1000) / 1000.0},"rows":$n""" +
          mem.map { case (p, sp) =>
            s""","peak_mb":${math.round(p * 10) / 10.0}""" +
              s""","spill_mb":${math.round(sp * 10) / 10.0}""" }.getOrElse("") +
          "}"
      }
      println(s"""{"probe":"scale","scale":$s,"docs":$nd,"vecs":$ne,""" +
        rows.mkString(",") + "}")
      docs.unpersist(); emb.unpersist()
    }

    // deep-graph CC: a 50k-node chain (diameter 50k) — min-label would
    // need 50k rounds; star contraction is the only viable path
    val chain = spark.range(1L, 50000L).select($"id".as("d1"), ($"id" - 1).as("d2"))
    val (cc, sec) = timeIt(operators.Dedup.connectedComponentsStars(chain).count())
    println(f"star_cc_50k_chain      $sec%8.2f s   (nodes=$cc)")
    spark.stop()
  }
}
