package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 battery — hardening contracts from the round-15 advice:
  * c4Flags badWords entries are DATA (quotes never reach SQL syntax,
  * multi-word phrases actually match), the coalesced ranged-slice
  * path keeps the per-member byte cap (and only that cap) under any
  * group size, and the per-thread range-read stream cache
  * distinguishes fs.* override sets on the same path.
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
