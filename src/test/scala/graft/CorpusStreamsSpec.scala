package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sharding
import graft.streaming.CorpusStreams

/** Stream/batch parity for sequence packing: the stateful stream
  * packer must produce, over any micro-batch slicing, exactly the
  * fragments the batch packer produces on the same docs. */
class CorpusStreamsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def asDocs(df: org.apache.spark.sql.DataFrame) =
    df.select($"source", $"doc_id", $"text").as[CorpusStreams.Doc]

  private def shape(df: org.apache.spark.sql.DataFrame) = df
    .select("source", "doc_id", "seq_id", "frag_start", "frag_len", "seq_offset")
    .collect().map(_.toSeq).toSet

  test("batch-mode packDocStream equals packSequences on the fixture") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val stream = shape(CorpusStreams.packDocStream(asDocs(docs), 64).toDF())
    val batch = shape(Sharding.packSequences(docs, 64))
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
  }

  test("tape state carries across micro-batches (no offset restart)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def doc(id: Long, tokens: Int) =
      CorpusStreams.Doc("s", id, Seq.fill(tokens)("w").mkString(" "))
    val ms = MemoryStream[CorpusStreams.Doc]
    val q = CorpusStreams.packDocStream(ms.toDS(), seqLen = 64)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_pack").start()
    try {
      ms.addData(doc(1, 40))            // tape now at 40
      q.processAllAvailable()
      ms.addData(doc(2, 40), doc(3, 10)) // 40..80 spans the first cut
      q.processAllAvailable()
      val got = spark.table("stream_pack")
        .select("doc_id", "seq_id", "frag_start", "frag_len", "seq_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val expected = Set(
        (1L, 0L, 0L, 40L, 0L),   // doc1 whole, head of seq 0
        (2L, 0L, 0L, 24L, 40L),  // doc2 fills seq 0 ...
        (2L, 1L, 24L, 16L, 0L),  // ... and spills into seq 1
        (3L, 1L, 0L, 10L, 16L))  // doc3 continues seq 1 after the spill
      assert(got == expected, s"got $got")
      // the batch packer on the union produces the same fragments
      val batch = Sharding.packSequences(
        Seq(("s", 1L, Seq.fill(40)("w").mkString(" ")),
            ("s", 2L, Seq.fill(40)("w").mkString(" ")),
            ("s", 3L, Seq.fill(10)("w").mkString(" ")))
          .toDF("source", "doc_id", "text"), 64)
        .select("doc_id", "seq_id", "frag_start", "frag_len", "seq_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(batch == expected)
    } finally q.stop()
  }

  test("ordering-contract violation fails loud, not silently mispacked") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def doc(id: Long) = CorpusStreams.Doc("s", id, "a b c")
    val ms = MemoryStream[CorpusStreams.Doc]
    val q = CorpusStreams.packDocStream(ms.toDS(), seqLen = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_pack_ooo").start()
    try {
      ms.addData(doc(5))
      q.processAllAvailable()
      ms.addData(doc(4)) // regression: arrives after 5
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(ex.getMessage != null)
    } finally q.stop()
  }
}
