package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.EventStreams

class StreamingMultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private lazy val events = Tables.events(spark, sf)

  test("streaming tumbling agg equals the batch plan (memory sink, available-now)") {
    val streamDf = EventStreams.streamingTumbling(spark, sf, "1 hour", "2 hours")
    val q = streamDf.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_tumbling")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stream_tumbling")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.tumblingAgg(events, "1 hour")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("watermark bounds state: append mode emits only closed windows") {
    val streamDf = EventStreams.streamingTumbling(spark, sf, "1 hour", "2 hours")
    val q = streamDf.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_append")
      .start()
    try q.processAllAvailable() finally q.stop()
    // all but the watermark-open tail must be emitted
    val emitted = spark.table("stream_append").count()
    val total = EventStreams.tumblingAgg(events, "1 hour").count()
    assert(emitted > 0 && emitted <= total)
  }

  test("flatMapGroupsWithState sessionization agrees with session_window") {
    import spark.implicits._
    val typed = events
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value")
      .as[EventStreams.Event]
    val custom = EventStreams.userSessions(typed, gapMillis = 30 * 60 * 1000)
      .select($"user_id",
        date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
        $"n_events")
      .collect().map(_.toSeq).toSet
    val builtin = EventStreams.sessionAgg(events, "30 minutes")
      .select($"user_id", $"session_start", $"n_events")
      .collect().map(_.toSeq).toSet
    assert(custom == builtin,
      s"missing=${(builtin -- custom).take(3)} extra=${(custom -- builtin).take(3)}")
  }

  test("multimodal: metadata-only projection prunes the payload column from the scan") {
    val assets = Multimodal.assetsFromText(Tables.documents(spark, sf))
    val plan = Multimodal.metadataOnly(assets).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("payload"),
      s"payload must not be read for metadata-only access:\n$plan")
  }

  test("multimodal stubs: deterministic decode/resize/features/frames") {
    import spark.implicits._
    val assets = Multimodal.assetsFromText(Tables.documents(spark, sf)).cache()
    val d1 = Multimodal.decodeImageStub(assets).select("asset_id", "width", "height")
      .collect().map(_.toSeq).toSet
    val d2 = Multimodal.decodeImageStub(assets).select("asset_id", "width", "height")
      .collect().map(_.toSeq).toSet
    assert(d1 == d2)

    val feats = Multimodal.featureExtractStub(assets, dim = 8)
    assert(feats.filter(size($"features") =!= 8).count() == 0)
    // features bounded in [-1, 1)
    assert(feats.filter(exists($"features", f => abs(f) > 1.0)).count() == 0)

    val frames = Multimodal.frameSampleStub(assets, frameSize = 64, stride = 4)
    assert(frames.count() >= assets.count()) // >= 1 frame per asset
    assert(frames.filter($"frame_idx" % 4 =!= 0).count() == 0)
  }

  test("byte-budget repartitioning yields sane partition counts") {
    val assets = Multimodal.assetsFromText(Tables.documents(spark, sf))
    val repart = Multimodal.repartitionByBytes(assets, targetBytes = 16 * 1024)
    val n = repart.rdd.getNumPartitions
    assert(n >= 1 && n <= 64, s"unexpected partition count $n")
  }
}
