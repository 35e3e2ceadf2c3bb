package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Real audio codecs as native Catalyst expressions over `binary`
  * payload columns — JDK-only (`javax.sound.sampled` ships WAV/AIFF/AU
  * PCM parsing in every JRE, so no external libraries are assumed;
  * compressed formats like MP3/AAC have no JDK codec and stay out of
  * scope, quarantining as null like any undecodable payload):
  *
  *   - `audio_meta(binary) -> struct<sample_rate:int,channels:int,
  *                                   frames:bigint,bits:int>`
  *   - `ehash64(binary)    -> bigint`  (energy-gradient fingerprint)
  *   - `ehash64_energy(array<bigint>) -> bigint` (65 energies, hash
  *     math only)
  *
  * `ehash64` is the audio analogue of the image dHash: decode to PCM,
  * mix down to mono (integer channel mean), split into 65 equal
  * windows, take each window's mean |amplitude| as its energy, and
  * set bit i iff energy(i+1) > energy(i) — the sign of the energy
  * DELTA, which survives uniform volume scaling exactly (scaling
  * every sample by a constant scales every window energy together and
  * strict inequalities are preserved up to integer truncation). That
  * delta-sign robustness is the same primitive published acoustic
  * fingerprinters build on; 64 bits keeps the near-dup machinery
  * ([[graft.operators.Multimodal.hashNearDupPairs]]) shared verbatim
  * with the image path.
  *
  * The decode expressions return NULL for undecodable bytes (corrupt
  * rows must not kill a 100 TB scan); `ehash64_energy` is the pure
  * integer bit assembly factored out so the DuckDB oracle can replay
  * it over fixture-derived envelopes (the parquet fixtures carry no
  * real audio bytes — real decode is spec-verified against
  * synthesized WAV payloads).
  *
  * Scale: decode cost is per-row CPU on executors, no shuffle; one
  * static call per expression (the [[ImageCore]] pattern) keeps the
  * projection inside whole-stage codegen. */
object AudioCore {

  /** Decoded PCM as (mono samples, sampleRate, channels, bits), or
    * null for anything `javax.sound.sampled` cannot parse. Only PCM
    * encodings are read directly (WAV/AIFF/AU carry PCM); 16-bit
    * samples honor the container's endianness, 8-bit honor the
    * signed/unsigned encoding. */
  final class Pcm(val mono: Array[Long], val sampleRate: Int,
                  val channels: Int, val bits: Int)

  def decode(bytes: Array[Byte]): Pcm = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = f.getSampleSizeInBits
        if ((!signed && !unsigned) || (bits != 8 && bits != 16)) null
        else {
          val data = in.readAllBytes()
          val ch = f.getChannels
          val bytesPerSample = bits / 8
          val frameBytes = ch * bytesPerSample
          val nFrames = data.length / frameBytes
          val mono = new Array[Long](nFrames)
          val big = f.isBigEndian
          var fr = 0
          while (fr < nFrames) {
            var sum = 0L
            var c = 0
            while (c < ch) {
              val off = fr * frameBytes + c * bytesPerSample
              val s: Long =
                if (bits == 16) {
                  val (hi, lo) = if (big) (data(off), data(off + 1))
                                 else (data(off + 1), data(off))
                  val raw = (hi << 8) | (lo & 0xff)
                  // unsigned 16-bit centers at 0x8000 — recenter, don't
                  // reinterpret as two's complement (that would decode
                  // silence as max amplitude)
                  if (signed) raw.toShort.toLong
                  else (raw & 0xffff).toLong - 32768L
                } else if (signed) data(off).toLong
                else (data(off) & 0xff).toLong - 128L
              sum += s
              c += 1
            }
            mono(fr) = sum / ch
            fr += 1
          }
          new Pcm(mono, f.getSampleRate.toInt, ch, bits)
        }
      } finally in.close()
    } catch { case _: Exception => null }
  }

  /** (sample_rate, channels, frames, bits) as an InternalRow, or null. */
  def metaRow(bytes: Array[Byte]): GenericInternalRow = {
    val pcm = decode(bytes)
    if (pcm == null) null
    else new GenericInternalRow(Array[Any](
      pcm.sampleRate, pcm.channels, pcm.mono.length.toLong, pcm.bits))
  }

  /** 65-window mean-|amplitude| envelope over the integer window
    * lattice (windows partition the samples; clips shorter than 65
    * samples repeat edge samples via the forced w1 > w0, the
    * [[ImageCore.grayGrid]] convention). */
  def envelope(mono: Array[Long], nWin: Int): Array[Long] = {
    val n = mono.length
    val out = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      val w0 = (i.toLong * n / nWin).toInt
      val w1 = math.max(w0 + 1, ((i + 1).toLong * n / nWin).toInt)
      var sum = 0L
      var cnt = 0L
      var j = w0
      while (j < w1 && j < n) {
        sum += math.abs(mono(j))
        cnt += 1
        j += 1
      }
      out(i) = if (cnt == 0) 0L else sum / cnt
      i += 1
    }
    out
  }

  /** eHash bit assembly over exactly 65 energies (bit i = sign of the
    * i-th energy delta). */
  def eHashFromEnergies(e: Array[Long]): Long = {
    require(e.length == 65, s"ehash needs 65 energies, got ${e.length}")
    var out = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Boxed so generated code can branch on decode failure. */
  def eHash(bytes: Array[Byte]): java.lang.Long = {
    val pcm = decode(bytes)
    if (pcm == null || pcm.mono.length == 0) null
    else java.lang.Long.valueOf(eHashFromEnergies(envelope(pcm.mono, 65)))
  }

  def eHashEnergy(arr: ArrayData): Long =
    eHashFromEnergies(ImageCore.cellsOf(arr))
}

case class EHash64(child: Expression) extends BinaryImageHash {
  override def staticCall: String = "graft.functions.AudioCore.eHash"
  override def evalBytes(bytes: Array[Byte]): java.lang.Long = AudioCore.eHash(bytes)
  override protected def withNewChildInternal(newChild: Expression): EHash64 =
    copy(child = newChild)
  override def prettyName: String = "ehash64"
}

object EHash64 {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "ehash64", classOf[EHash64])
}

case class EHash64Energy(child: Expression) extends GrayHash {
  override def compute(arr: ArrayData): Long = AudioCore.eHashEnergy(arr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AudioCore.eHashEnergy($c);")
  override protected def withNewChildInternal(newChild: Expression): EHash64Energy =
    copy(child = newChild)
  override def prettyName: String = "ehash64_energy"
}

object EHash64Energy {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "ehash64_energy", classOf[EHash64Energy])
}

/** `audio_meta(binary) -> struct<sample_rate,channels,frames,bits>` —
  * container-level metadata via the PCM decode. Null for undecodable
  * payloads. */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("bits", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_meta requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    AudioCore.metaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.AudioCore.metaRow($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
  override def prettyName: String = "audio_meta"
}

object AudioMeta {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "audio_meta", classOf[AudioMeta])
}
