package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing here is REAL and tested — schema, byte
  * budgeting/partitioning, batch shapes, deterministic outputs. The
  * actual codec work is STUBBED (this container has no image/audio
  * libraries): every `*Stub` function derives a deterministic fake
  * from the bytes (documented per function) so pipelines exercise the
  * full dataflow. Swapping a stub for a real decoder is a drop-in
  * replacement of one column expression / mapPartitions body.
  *
  * Scale: assets are heavy rows. The two rules this module encodes:
  * (1) never shuffle payload bytes unless the operator needs them
  * (metadata-only projections prune the binary column at the scan);
  * (2) size partitions by BYTES not row count — [[repartitionByBytes]].
  */
object Multimodal {

  /** Canonical asset schema: (asset_id, modality, payload, meta…). */
  def assetsFromText(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("modality"),
      // stand-in payload: utf-8 bytes of the text (deterministic)
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(col("text")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Byte-budget repartitioning: compute per-row payload size, use the
    * running total to choose a partition count so each partition holds
    * ~`targetBytes`. At 100 TB this is the difference between balanced
    * executors and OOM on skewed assets. */
  def repartitionByBytes(assets: DataFrame, targetBytes: Long): DataFrame = {
    // sum() over zero rows is null — coalesce so an empty frame
    // repartitions to 1 instead of NPEing on getLong
    val total = assets.agg(coalesce(sum(length(col("payload"))), lit(0L)))
      .first().getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    assets.repartition(parts, col("asset_id"))
  }

  /** STUB image decode: real decoder would parse the codec header; the
    * stub derives deterministic (width, height, channels) from a hash
    * of the payload so downstream plumbing sees realistic metadata. */
  def decodeImageStub(assets: DataFrame): DataFrame =
    assets
      .withColumn("width", (pmod(xxhash64(col("payload")), lit(1920)) + 1).cast("int"))
      .withColumn("height", (pmod(xxhash64(col("payload"), lit(1)), lit(1080)) + 1).cast("int"))
      .withColumn("channels", lit(3))

  /** STUB resize: records the target size and re-derives a payload
    * fingerprint; a real kernel would transform pixels in
    * `mapPartitions` over Arrow batches. */
  def resizeStub(decoded: DataFrame, w: Int, h: Int): DataFrame =
    decoded
      .withColumn("resized_width", lit(w))
      .withColumn("resized_height", lit(h))
      .withColumn("resized_fp", xxhash64(col("payload"), lit(w), lit(h)))

  /** STUB feature extraction: a deterministic 8-dim pseudo-embedding
    * from stride-hashed byte windows — the batch shape (fixed-width
    * array<double> per asset) is exactly what a real vision encoder
    * emits, so similarity search composes on top unchanged. */
  def featureExtractStub(assets: DataFrame, dim: Int = 8): DataFrame = {
    val feats = (0 until dim).map { i =>
      (pmod(xxhash64(col("payload"), lit(i)), lit(2000000)).cast("double") / 1000000.0 - 1.0)
    }
    assets.withColumn("features", array(feats: _*))
  }

  /** STUB video frame sampling: treats the payload as `frameSize`-byte
    * frames, keeps every `stride`-th frame's offset + fingerprint —
    * the explode shape of real frame sampling. */
  def frameSampleStub(assets: DataFrame, frameSize: Int = 64, stride: Int = 4): DataFrame =
    assets
      .withColumn("n_frames", greatest(floor(length(col("payload")) / frameSize), lit(1)).cast("int"))
      .withColumn("frame_idx", explode(expr(s"sequence(0, n_frames - 1, $stride)")))
      .withColumn("frame_fp",
        xxhash64(expr(s"substring(payload, frame_idx * $frameSize + 1, $frameSize)")))
      .select("asset_id", "modality", "frame_idx", "frame_fp")

  /** Metadata-only projection: never touches payload bytes — the
    * binary column is pruned out of the scan (asserted in spec). */
  def metadataOnly(assets: DataFrame): DataFrame =
    assets.select(col("asset_id"), col("modality"), col("meta"))
}
