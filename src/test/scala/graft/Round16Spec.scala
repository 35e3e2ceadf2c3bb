package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 battery. Advice hardening: c4Flags badWords entries are
  * DATA (quotes never reach SQL syntax, multi-word phrases actually
  * match), the coalesced ranged-slice path keeps the per-member byte
  * cap (and only that cap) under any group size via the per-member
  * fallback, and the per-thread range-read stream cache
  * distinguishes fs.* override sets on the same path. Build
  * contracts: the full HTML 4.01 entity table + HTML5 legacy
  * no-semicolon decoding, the PSL published-format snapshot battery
  * (punycode / private-section / wildcard / exception at depth),
  * `fanoutFor` + the shuffle-free default, the slowfile-counted
  * k-fold request-cut and the optimizer-pushdown regression pin
  * (file_range_read non-determinism keeps reads in their stage,
  * one per member), `mix64_fold` pinned against the independent
  * reference constants (the q35 oracle's replayable band key), and
  * the SRP semantic-pair form past the sign-band dimension ceiling.
  */
class Round16Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------- c4Flags badWords

  test("c4Flags badWords: quoted entries are data not syntax, phrases match, tokens stay whole-word") {
    val docs = Seq(
      (1L, "this page mentions don't somewhere. and more text here."),
      (2L, "a multi word phrase lives here. more filler sentences follow."),
      (3L, "scunthorpe is a perfectly fine town. nothing wrong at all."),
      (4L, "clean page with nothing flagged. entirely wholesome text."))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .c4Flags(docs, minSentences = 1L,
        // a quote-bearing token, a multi-word phrase, and a token that
        // is a SUBSTRING of doc 3's first word (must not match it)
        badWords = Seq("don't", "multi word phrase", "thorpe"))
      .select($"doc_id", $"has_bad_word")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, true), (2L, true), (3L, false), (4L, false)))
  }

  test("c4Flags badWords: matching is case-insensitive on both sides") {
    val docs = Seq((1L, "BADWORD appears here. yes."),
      (2L, "the Bad Phrase sits here. yes.")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .c4Flags(docs, minSentences = 1L, badWords = Seq("BadWord", "BAD PHRASE"))
      .select($"doc_id", $"has_bad_word")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, true), (2L, true)))
  }

  // -------------------------------- coalesced ranged slicing byte caps

  private def writeArchiveFiles(docs: org.apache.spark.sql.DataFrame): (java.io.File, java.io.File) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r16").toFile
    val arcDir = new java.io.File(dir, "arcs"); arcDir.mkdirs()
    graft.sources.WebArchive.buildWetArchives(docs)
      .as[(String, Array[Byte])].collect().foreach { case (a, p) =>
        java.nio.file.Files.write(
          new java.io.File(arcDir, s"$a.warc.gz").toPath, p)
      }
    (dir, arcDir)
  }

  test("sliceMembersRanged coalesced: a group collectively over the per-member cap stays healthy; a single over-cap member quarantines with the per-member err in both forms") {
    import graft.sources.WebArchive
    // one bulky member (doc 5's long text) among small ones, one file
    val docs = (1L to 6L).map(i =>
      (i, if (i == 5L) "x " * 600 else s"tiny doc $i", "arcQ"))
      .toDF("doc_id", "text", "source")
    val (_, arcDir) = writeArchiveFiles(docs)
    val fileRows = spark.read.format("binaryFile")
      .load(arcDir.getAbsolutePath)
      .select($"path".as("archive"), $"content".as("payload"))
    val idx = WebArchive.memberIndex(fileRows)
    val clens = idx.select($"member_clen").as[Long].collect().sorted
    // a cap that admits every member individually but is under the
    // whole-group span: the group fetch must scale its cap by k or it
    // would quarantine all six healthy members
    val cap = clens.max
    assert(cap < clens.sum, "fixture must span more than one member cap")
    def run(k: Int, mx: Long) =
      WebArchive.sliceMembersRanged(idx, maxSliceBytes = mx, coalesceMembers = k)
        .select($"base_index", $"slice_err", length($"slice"))
        .as[(Int, Option[String], Option[Int])]
        .collect().sortBy(_._1).toSeq
    val perMember = run(1, cap)
    val grouped = run(6, cap)
    assert(grouped == perMember)
    assert(grouped.size == 6 && grouped.forall(_._2.isEmpty))

    // now a cap that the bulky member alone exceeds: it must
    // quarantine with the SAME per-member err string in both forms,
    // while its five group-mates stay healthy under coalescing
    val tight = clens.sorted.apply(4) // admits the 5 small, not the max
    val pm = run(1, tight)
    val gr = run(6, tight)
    assert(gr == pm, s"coalesced diverged from per-member:\n$gr\n$pm")
    assert(gr.count(_._2.isEmpty) == 5)
    val errs = gr.flatMap(_._2)
    assert(errs.size == 1 && errs.head ==
      s"range length $cap exceeds $tight byte cap")
  }

  // --------------------------- full HTML 4.01 entity table + legacy forms

  test("html_unescape: every HTML 4.01 entity class decodes — Latin-1 accents, Greek, math/symbols, special block") {
    import graft.functions.HtmlUnescapeCore.{unescape, Named}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def d(s: String) = unescape(u(s)).toString
    // the accented-letter tier the r15 verdict called out as missing
    assert(d("caf&eacute; &Uuml;ber na&iuml;ve gar&ccedil;on") ==
      "café Über naïve garçon")
    assert(d("&Aring;ngstr&ouml;m &aelig;on &ntilde;") == "Ångström æon ñ")
    // Latin-1 zip order guards: spot codepoints at block boundaries
    // and around the times/divide interlopers
    assert(Named("nbsp") == "\u00A0" && Named("yuml") == "ÿ")
    assert(Named("Agrave") == "À" && Named("szlig") == "ß")
    assert(Named("times") == "×" && Named("Oslash") == "Ø")
    assert(Named("divide") == "÷" && Named("oslash") == "ø")
    assert(Named("eth") == "ð" && Named("thorn") == "þ" && Named("ETH") == "Ð")
    // Greek incl. final sigma and the symbol variants
    assert(d("&alpha;&beta;&Gamma;&Omega;&sigma;&sigmaf;&piv;") == "αβΓΩσςϖ")
    // math / arrows / letterlike / suits
    assert(d("&forall;x&isin;S: x&le;y &rArr; &radic;2&ne;&infin;") ==
      "∀x∈S: x≤y ⇒ √2≠∞")
    assert(d("&spades;&hearts;&diams;&clubs; &weierp;&alefsym;&loz;") ==
      "♠♥♦♣ ℘ℵ◊")
    // special block: ligatures, spacing marks, quotes, euro, HTML5 lang
    assert(d("&OElig;&oelig; &Scaron;&scaron;&Yuml; &euro;9") == "\u0152\u0153 \u0160\u0161\u0178 \u20AC9")
    assert(d("&sbquo;&bdquo;&lsaquo;&rsaquo;&oline;&frasl;") ==
      "\u201A\u201E\u2039\u203A\u203E\u2044")
    assert(d("&ensp;|&emsp;|&thinsp;|&zwnj;&zwj;&lrm;&rlm;") ==
      "\u2002|\u2003|\u2009|\u200C\u200D\u200E\u200F")
    assert(d("&lang;x&rang;") == "⟨x⟩") // the HTML5 U+27E8/9 revision
    // uppercase legacy spellings are valid WITH the semicolon too
    assert(d("&AMP;&LT;&GT;&QUOT;&COPY;&REG;") == "&<>\"©®")
    // ...but non-spec case variants are not
    assert(d("&Amp; &EURO;") == "&Amp; &EURO;")
  }

  test("html_unescape: legacy names decode without a semicolon by longest match; non-legacy names do not") {
    import graft.functions.HtmlUnescapeCore.{unescape, Named, Legacy}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def d(s: String) = unescape(u(s)).toString
    // the published legacy list is the Latin-1-era set: every legacy
    // name must be in the named table, and the count pins the list
    assert(Legacy.subsetOf(Named.keySet))
    assert(Legacy.size == 106, s"legacy list drifted: ${Legacy.size}")
    assert(d("&copy 2020 Example Corp") == "© 2020 Example Corp")
    assert(d("&Uumlber &eacute") == "Über é") // end-of-string form
    // longest match: &notit; → ¬it; (not + literal tail), &notin; is
    // the full HTML4 name and wins over the legacy prefix
    assert(d("&notit;") == "¬it;")
    assert(d("&notin;") == "∉")
    assert(d("x=1&copy=2") == "x=1©=2") // the data-state URL hazard, spec'd
    // NON-legacy names require the semicolon (euro/alpha/hellip...)
    assert(d("&euro 100 &alpha test &hellip end") ==
      "&euro 100 &alpha test &hellip end")
    // no 1-char false positives, prose ampersands intact
    assert(d("AT&T, R&D, fish & chips, you&me") ==
      "AT&T, R&D, fish & chips, you&me")
    // numeric refs still REQUIRE the semicolon (documented divergence)
    assert(d("&#169 and &#xA9") == "&#169 and &#xA9")
    // single-pass safety composes with legacy: &amp never re-decodes
    assert(d("&ampcopy; &amp;copy;") == "&copy; &copy;")
  }

  test("sliceMembersRanged fan-out: shuffle-free when None; fanoutFor sizes the repartition only when asked") {
    import graft.sources.WebArchive
    val docs = (1L to 9L).map(i => (i, s"doc $i", "arcF"))
      .toDF("doc_id", "text", "source")
    val (_, arcDir) = writeArchiveFiles(docs)
    val fileRows = spark.read.format("binaryFile")
      .load(arcDir.getAbsolutePath)
      .select($"path".as("archive"), $"content".as("payload"))
    val idx = WebArchive.memberIndex(fileRows)
    // default: no exchange anywhere in the per-member plan
    val plain = WebArchive.sliceMembersRanged(idx)
    assert(!plain.queryExecution.executedPlan.toString.contains("Exchange"),
      "fanoutPartitions=None must keep the per-member plan shuffle-free")
    // asked: the documented formula sizes a round-robin repartition
    val k = WebArchive.fanoutFor(totalMembers = 9L, membersPerTask = 2L)
    assert(k == 5)
    val fanned = WebArchive.sliceMembersRanged(idx, fanoutPartitions = Some(k))
    assert(fanned.rdd.getNumPartitions == 5)
    assert(fanned.count() == 9)
    // the production numbers the recipe quotes
    assert(WebArchive.fanoutFor(1000000000L) == 244141)
    assert(WebArchive.fanoutFor(0L) == 1)
  }

  test("coalesceMembers cuts ranged-request count k-fold: slowfile-counted reads, byte-identical output") {
    import graft.sources.{SlowLocalFileSystem, WebArchive}
    val docs = (1L to 40L).map(i => (i, s"member $i text", "arcS"))
      .toDF("doc_id", "text", "source")
    val (root, arcDir) = writeArchiveFiles(docs)
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slowfile.impl", "graft.sources.SlowLocalFileSystem")
    hc.set("fs.slowfile.delay.ms", "0")
    try {
      val files = arcDir.listFiles().map(f => "file:" + f.getAbsolutePath).toSeq
        .toDF("archive")
      val idx = WebArchive.memberIndexFromPaths(files)
        .withColumn("archive",
          regexp_replace($"archive", "^file:", "slowfile:"))
      val idxPath = new java.io.File(root, "idx").getAbsolutePath
      idx.write.parquet(idxPath)
      val index = spark.read.parquet(idxPath)
      def run(k: Int) = {
        SlowLocalFileSystem.positionedReads.set(0L)
        val out = WebArchive.sliceMembersRanged(index, coalesceMembers = k)
          .select($"base_index", md5($"slice"), $"slice_err")
          .as[(Int, String, Option[String])].collect().sortBy(_._1).toSeq
        (out, SlowLocalFileSystem.positionedReads.get())
      }
      val (perMember, n1) = run(1)
      val (grouped, n8) = run(8)
      assert(grouped == perMember)
      assert(perMember.size == 40 && perMember.forall(_._3.isEmpty))
      // the dial's claim IS this arithmetic: 40 requests → ceil(40/8)
      assert(n1 == 40L, s"per-member issued $n1 reads")
      assert(n8 == 5L, s"coalesced(8) issued $n8 reads")

      // the r16 optimizer trap, pinned: a caller filtering on
      // slice_err used to have the predicate REWRITTEN through the
      // projection and pushed below the fan-out exchange — every
      // member fetched once in the (serial) index-scan stage for the
      // filter and again post-shuffle for the projection: 2× the GETs
      // and the fan-out dead. file_range_read's declared
      // non-determinism forbids the rewrite; exactly one read per
      // member must survive a filtered, fanned, counted plan.
      SlowLocalFileSystem.positionedReads.set(0L)
      val n = WebArchive.sliceMembersRanged(index,
        fanoutPartitions = Some(8), coalesceMembers = 1)
        .filter($"slice_err".isNull).count()
      assert(n == 40L)
      assert(SlowLocalFileSystem.positionedReads.get() == 40L,
        s"filtered+fanned plan issued ${SlowLocalFileSystem.positionedReads.get()} reads for 40 members")
    } finally {
      hc.unset("fs.slowfile.impl")
      hc.unset("fs.slowfile.delay.ms")
    }
  }

  // ------------------------------ page directives (canonical / robots)

  test("pageDirectives: both attribute orders and cases match; tokens are whole-word; absent directives null/false") {
    val rows = Seq(
      (1L, """<link rel="canonical" href="https://a.org/X"><meta name="robots" content="noindex,nofollow">"""),
      (2L, """<LINK href='https://b.org/Y' rel='canonical'><META content='NOFOLLOW, archive' name='ROBOTS'>"""),
      // lookalike token must NOT count; stylesheet link must not match
      (3L, """<link rel="stylesheet" href="/s.css"><meta name="robots" content="noindexfoo">"""),
      (4L, """<p>no head directives at all</p>"""))
      .toDF("doc_id", "html")
    val got = graft.operators.Html.pageDirectives(rows, "html")
      .select($"doc_id", $"rel_canonical", $"meta_robots", $"noindex", $"nofollow")
      .as[(Long, Option[String], Option[String], Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("https://a.org/X"), Some("noindex,nofollow"), true, true),
      (2L, Some("https://b.org/Y"), Some("NOFOLLOW, archive"), false, true),
      (3L, None, Some("noindexfoo"), false, false),
      (4L, None, None, false, false)))
  }

  // ------------------- SRP semantic pairs (past the sign-band ceiling)

  test("semanticNearDupPairsSrp: bit width decoupled from dimension, same integer gate — planted pair found, anti-correlated pair rejected") {
    import graft.operators.Similarity
    // dim-8 vectors: the sign-band family tops out at bands×bandBits
    // = 8 here; SRP buckets at bits=16 are impossible for it and
    // routine for the hyperplane form — the r16 ladder's handoff
    val v1 = Seq(0.9f, -0.3f, 0.5f, 0.1f, -0.7f, 0.2f, 0.8f, -0.1f)
    val v2 = v1.map(x => x * 1.02f + 0.005f) // near-identical direction
    val v3 = Seq(-0.3f, 0.9f, 0.1f, 0.5f, 0.2f, -0.7f, -0.1f, 0.8f) // dot(v1,v3) < 0
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDupPairsSrp(df,
        tables = 8, bits = 16, seed = 7L)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // the sign-band form REJECTS this dial on dim-8 input (loud, not
    // silent): 8 bands × 16 bits would read past the array end
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticNearDupPairs(df, bands = 8, bandBits = 16)
    }
    assert(e.getMessage.contains("bands*bandBits"))
    // determinism: the seeded hyperplanes make the pair frame a pure
    // function of (input, dials)
    val again = Similarity.semanticNearDupPairsSrp(df,
        tables = 8, bits = 16, seed = 7L)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(again == pairs)
  }

  // ------------------------------- mix64_fold (the replayable band key)

  test("mix64_fold: splitmix fold pinned against the independent reference; registered in SQL; empty array returns the seed") {
    graft.functions.Mix64Fold.register(spark)
    // constants computed by an independent (python) reimplementation
    // of the splitmix64 finalizer — the same arithmetic the q35
    // DuckDB oracle replays, so engine/oracle/spec triangulate
    val got = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long]),
      (3L, Seq(-1L)))
      .toDF("id", "arr")
      .selectExpr("id", "mix64_fold(arr, 0L) AS f0", "mix64_fold(arr, 1L) AS f1",
        "mix64_fold(arr, 2L) AS f2", "mix64_fold(arr, 7L) AS f7")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0)._2 == -3426316478316322125L) // fold([1,2,3], 0)
    assert(got(0)._3 == -3450021587346987872L) // fold([1,2,3], 1)
    assert(got(1)._5 == 7L)                    // fold([], seed) = seed
    assert(got(2)._4 == -621772950581698083L)  // fold([-1], 2)
  }

  // ----------------------------------- PSL snapshot — real rule shapes

  test("registrableDomainPsl: a published-format snapshot with punycode, private-section, wildcard and exception families resolves per the PSL algorithm") {
    import graft.operators.Domains
    import graft.operators.Domains.PslRules
    val url = getClass.getResource("/public_suffix_snapshot.dat")
    assert(url != null, "snapshot resource missing")
    val rules = PslRules.fromFile(spark, url.toString)
    // the snapshot's three rule classes all loaded at realistic depth
    assert(rules.normal.values.map(_.size).sum >= 60)
    assert(rules.wildcard.values.map(_.size).sum >= 9)
    assert(rules.exception.values.map(_.size).sum >= 8)
    val cases = Seq(
      // uk second-level family
      (1L, "a.b.example.co.uk", Some("example.co.uk")),
      (2L, "police.uk", None),
      (3L, "x.police.uk", Some("x.police.uk")),
      // jp prefecture-city wildcards + city exceptions, at depth
      (4L, "w.x.host.kobe.jp", Some("x.host.kobe.jp")),
      (5L, "www.city.kobe.jp", Some("city.kobe.jp")),
      (6L, "city.nagoya.jp", Some("city.nagoya.jp")),
      (7L, "host.sapporo.jp", None),
      // host EQUAL to a wildcard base: *.sendai.jp does not match, so
      // the plain `jp` rule decides and sendai.jp itself registers
      (8L, "sendai.jp", Some("sendai.jp")),
      // whole-TLD wildcard (*.er): every 2-label form is a suffix
      (9L, "foo.bar.er", Some("foo.bar.er")),
      (10L, "bar.er", None),
      // punycode TLD rules match the (already-punycoded) host labels
      (11L, "example.xn--p1ai", Some("example.xn--p1ai")),
      (12L, "www.shop.xn--fiqs8s", Some("shop.xn--fiqs8s")),
      (13L, "xn--p1ai", None),
      // PRIVATE section: hosted-platform suffixes are registrable cuts
      (14L, "alice.github.io", Some("alice.github.io")),
      (15L, "deep.path.alice.github.io", Some("alice.github.io")),
      (16L, "github.io", None),
      (17L, "mysite.blogspot.com", Some("mysite.blogspot.com")),
      (18L, "bucket.s3.amazonaws.com", Some("bucket.s3.amazonaws.com")),
      // unknown TLD falls through to the default * rule
      (19L, "www.example.zz", Some("example.zz")))
      .toDF("id", "host", "want")
    val got = cases
      .select($"id", Domains.registrableDomainPsl($"host", rules).as("got"),
        $"want")
      .as[(Long, Option[String], Option[String])].collect().sortBy(_._1)
    got.foreach { case (id, g, w) => assert(g == w, s"case $id: got $g, want $w") }
  }

  // --------------------------------- stream cache keys carry fs.* conf

  test("FileRangeCore.read: distinct fs.* override sets on one path do not share a cached stream") {
    import org.apache.spark.unsafe.types.UTF8String
    val f = java.nio.file.Files.createTempFile("graft-r16-range", ".bin")
    java.nio.file.Files.write(f, Array.tabulate[Byte](64)(_.toByte))
    val p = UTF8String.fromString(s"file:${f.toAbsolutePath}")
    val confA = Seq("fs.graft.probe" -> "a")
    val confB = Seq("fs.graft.probe" -> "b")
    // interleave reads under both conf sets on the same thread: with a
    // path-only cache key the second set would reuse the first set's
    // stream; keyed correctly, each read still returns its exact range
    def slice(conf: Seq[(String, String)], off: Long, len: Long) = {
      val r = graft.functions.FileRangeCore.read(p, off, len, 1024L, conf)
      assert(r.isNullAt(1), s"unexpected err: ${r.getUTF8String(1)}")
      r.getBinary(0).toSeq
    }
    assert(slice(confA, 0L, 4L) == Seq[Byte](0, 1, 2, 3))
    assert(slice(confB, 4L, 4L) == Seq[Byte](4, 5, 6, 7))
    assert(slice(confA, 8L, 4L) == Seq[Byte](8, 9, 10, 11))
    assert(slice(confB, 60L, 4L) == Seq[Byte](60, 61, 62, 63))
  }
}
