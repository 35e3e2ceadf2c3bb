package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `media_type(binary) -> string` — magic-byte container sniffing for
  * opaque asset columns, the routing primitive a multimodal ingest
  * runs BEFORE any decode: payloads fan out to the right decoder
  * (image/audio), to the no-JDK-codec quarantine (video, compressed
  * audio), or to the unknown bucket, from the first few bytes alone.
  * Header sniffing is NOT decoding — it reads fixed-offset signatures
  * published in each container's spec, so it covers formats the JDK
  * cannot decode (MP4/Matroska/AVI/MP3/OGG/WebP) exactly as cheaply
  * as the ones it can.
  *
  * Returned labels (lowercase, stable API):
  *   png, jpeg, gif, bmp, webp, wav, aiff, au, mp3, ogg, flac,
  *   mp4, mkv, avi, pdf, gzip, zip, unknown
  * Null input stays null; empty/short/unrecognized payloads are
  * "unknown" (data, not an error — the quarantine contract).
  *
  * Scale: a per-row prefix inspection of ≤ 12 bytes, one static call
  * inside whole-stage codegen, no shuffle, and — unlike a decode —
  * constant-time whatever the payload size. */
object MediaTypeCore {

  private def has(b: Array[Byte], off: Int, sig: Int*): Boolean =
    b.length >= off + sig.length &&
      sig.indices.forall(i => (b(off + i) & 0xff) == sig(i))

  def sniff(bytes: Array[Byte]): UTF8String = {
    val t =
      if (bytes == null) "unknown"
      else if (has(bytes, 0, 0x89, 'P', 'N', 'G')) "png"
      else if (has(bytes, 0, 0xff, 0xd8, 0xff)) "jpeg"
      else if (has(bytes, 0, 'G', 'I', 'F', '8')) "gif"
      else if (has(bytes, 0, 'B', 'M')) "bmp"
      else if (has(bytes, 0, 'R', 'I', 'F', 'F') &&
               has(bytes, 8, 'W', 'E', 'B', 'P')) "webp"
      else if (has(bytes, 0, 'R', 'I', 'F', 'F') &&
               has(bytes, 8, 'W', 'A', 'V', 'E')) "wav"
      else if (has(bytes, 0, 'R', 'I', 'F', 'F') &&
               has(bytes, 8, 'A', 'V', 'I', ' ')) "avi"
      else if (has(bytes, 0, 'F', 'O', 'R', 'M') &&
               has(bytes, 8, 'A', 'I', 'F', 'F')) "aiff"
      else if (has(bytes, 0, '.', 's', 'n', 'd')) "au"
      else if (has(bytes, 0, 'I', 'D', '3') ||
               (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
                 (bytes(1) & 0xe0) == 0xe0)) "mp3"
      else if (has(bytes, 0, 'O', 'g', 'g', 'S')) "ogg"
      else if (has(bytes, 0, 'f', 'L', 'a', 'C')) "flac"
      else if (has(bytes, 4, 'f', 't', 'y', 'p')) "mp4"
      else if (has(bytes, 0, 0x1a, 0x45, 0xdf, 0xa3)) "mkv"
      else if (has(bytes, 0, '%', 'P', 'D', 'F')) "pdf"
      else if (has(bytes, 0, 0x1f, 0x8b)) "gzip"
      else if (has(bytes, 0, 'P', 'K', 0x03, 0x04)) "zip"
      else "unknown"
    UTF8String.fromString(t)
  }
}

case class MediaType(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_type requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MediaTypeCore.sniff(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaTypeCore.sniff($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaType =
    copy(child = newChild)
  override def prettyName: String = "media_type"
}

object MediaType {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "media_type", classOf[MediaType])
}
