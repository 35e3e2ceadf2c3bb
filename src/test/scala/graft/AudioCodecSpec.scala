package graft

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AudioCore
import graft.operators.Multimodal

/** Round-9 contracts for the REAL audio codecs (`javax.sound.sampled`
  * is JDK-native for WAV/AIFF/AU PCM, the same no-external-libraries
  * stance as the image path): decode round-trips synthesized
  * real-container bytes, the energy-gradient hash behaves per its
  * definition (monotone envelopes, volume invariance, container
  * agnosticism, stereo mixdown), and near-dup over the hashes finds
  * exactly the planted neighbor. */
class AudioCodecSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Encode 16-bit PCM samples as real container bytes. For stereo,
    * `samples` interleaves L,R per frame. */
  private def audioBytes(samples: Array[Short], rate: Float = 8000f,
                         channels: Int = 1,
                         fileType: AudioFileFormat.Type = AudioFileFormat.Type.WAVE,
                         bigEndian: Boolean = false): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, 2 * channels, rate, bigEndian)
    val data = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      val s = samples(i)
      if (bigEndian) {
        data(2 * i) = (s >> 8).toByte; data(2 * i + 1) = (s & 0xff).toByte
      } else {
        data(2 * i) = (s & 0xff).toByte; data(2 * i + 1) = (s >> 8).toByte
      }
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  /** One 650-sample waveform whose 65 ten-sample windows carry the
    * given |amplitude| levels (samples alternate sign inside a window
    * so the abs in the envelope is exercised). */
  private def waveOf(levels: Array[Long], gain: Int = 1): Array[Short] = {
    require(levels.length == 65)
    levels.flatMap { v =>
      (0 until 10).map(j =>
        (if (j % 2 == 0) v * gain else -v * gain).toShort)
    }
  }

  private def assetsOf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("asset_id", "payload")

  test("decodeAudio: real WAV mono/stereo meta; corrupt bytes quarantine as null") {
    val mono = audioBytes(Array.tabulate[Short](1600)(i => (i % 256).toShort))
    val stereo = audioBytes(Array.tabulate[Short](800)(i => (i % 128).toShort),
      rate = 16000f, channels = 2)
    val rows = Seq(1L -> mono, 2L -> stereo,
      3L -> "definitely not audio".getBytes("UTF-8"))
    val out = Multimodal.decodeAudio(assetsOf(rows))
      .select("asset_id", "sample_rate", "channels", "frames", "bits")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(1L) == ((Some(8000), Some(1), Some(1600L), Some(16))))
    assert(out(2L) == ((Some(16000), Some(2), Some(400L), Some(16))))
    assert(out(3L) == ((None, None, None, None)),
      "corrupt payload must yield null, not fail")
  }

  test("ehash64: a strictly rising envelope sets all 64 gradient bits") {
    val rising = waveOf(Array.tabulate[Long](65)(i => 100L * (i + 1)))
    val hashed = Multimodal.audioHashes(assetsOf(Seq(1L -> audioBytes(rising))))
    assert(hashed.collect().head.getAs[Long]("ehash") == -1L,
      "all-ones ehash expected for a monotone envelope")
  }

  test("ehash64 is volume-scaling invariant and container/endianness agnostic") {
    val levels = Array.tabulate[Long](65)(i => 500L + ((i * 7) % 13) * 100L)
    val base = waveOf(levels)
    val loud = waveOf(levels, gain = 8)
    val wav = audioBytes(base)
    val loudWav = audioBytes(loud)
    val aiff = audioBytes(base, fileType = AudioFileFormat.Type.AIFF,
      bigEndian = true)
    val got = Multimodal.audioHashes(assetsOf(Seq(
        1L -> wav, 2L -> loudWav, 3L -> aiff)))
      .select("asset_id", "ehash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L), "8x gain must not change gradient signs")
    assert(got(1L) == got(3L), "WAV(LE) and AIFF(BE) must hash identically")
  }

  test("stereo with L=R hashes identically to mono") {
    val levels = Array.tabulate[Long](65)(i => 300L + ((i * 11) % 17) * 50L)
    val mono = waveOf(levels)
    val stereo = mono.flatMap(s => Array(s, s))
    val got = Multimodal.audioHashes(assetsOf(Seq(
        1L -> audioBytes(mono),
        2L -> audioBytes(stereo, channels = 2))))
      .select("asset_id", "ehash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L))
  }

  test("audioNearDupPairs finds the planted near-neighbor and rejects the far clip") {
    val levels = Array.tabulate[Long](65)(i => 1000L + ((i * 7) % 13) * 100L)
    // nudge ONE window's level enough to flip its two adjacent
    // gradient signs at most: hamming(A, B) <= 2
    val nudged = levels.clone(); nudged(30) = 5000L
    val inverted = Array.tabulate[Long](65)(i => 1000L + (12 - (i * 7) % 13) * 100L)
    val assets = assetsOf(Seq(
      1L -> audioBytes(waveOf(levels)),
      2L -> audioBytes(waveOf(nudged)),
      3L -> audioBytes(waveOf(inverted))))
    val pairs = Multimodal.audioNearDupPairs(assets, maxHamming = 2, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)),
      s"exactly the planted pair: ${pairs.mkString(";")}")
  }

  test("media_type sniffs real codec bytes and spec'd container signatures; routeByType buckets them") {
    // real encoder output for the JDK-decodable formats…
    val bi = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    def imgBytes(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, fmt, bos); bos.toByteArray
    }
    val wav = audioBytes(Array.tabulate[Short](16)(_.toShort))
    val aiff = audioBytes(Array.tabulate[Short](16)(_.toShort),
      fileType = AudioFileFormat.Type.AIFF, bigEndian = true)
    // …and hand-built spec'd signatures for the no-JDK-codec ones
    def sig(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    val mp4 = sig(0, 0, 0, 24) ++ "ftypisom".getBytes("ASCII")
    val mkv = sig(0x1a, 0x45, 0xdf, 0xa3) ++ sig(0, 0, 0, 0)
    val avi = "RIFF".getBytes("ASCII") ++ sig(8, 0, 0, 0) ++ "AVI LIST".getBytes("ASCII")
    val mp3 = "ID3".getBytes("ASCII") ++ sig(4, 0, 0)
    val rows = Seq(
      1L -> imgBytes("png"), 2L -> imgBytes("jpg"), 3L -> imgBytes("bmp"),
      4L -> wav, 5L -> aiff, 6L -> mp4, 7L -> mkv, 8L -> avi, 9L -> mp3,
      10L -> "just some text".getBytes("UTF-8"))
    val out = Multimodal.routeByType(assetsOf(rows))
      .select("asset_id", "media_type", "route").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == (("png", "image")) && out(2L) == (("jpeg", "image")) &&
      out(3L) == (("bmp", "image")))
    assert(out(4L) == (("wav", "audio")) && out(5L) == (("aiff", "audio")))
    assert(out(6L) == (("mp4", "undecodable")) &&
      out(7L) == (("mkv", "undecodable")) &&
      out(8L) == (("avi", "undecodable")) &&
      out(9L) == (("mp3", "undecodable")))
    assert(out(10L) == (("unknown", "unknown")))
  }

  test("q137 energy-hash arithmetic matches AudioCore on the fixture formula") {
    def mix(n: Long): Long = {
      val a = (n * 2654435761L) % 4294967296L
      val b = a ^ (a / 65536L)
      val c = (b * 40503L) % 4294967296L
      (c ^ (c / 65536L)) % 65536L
    }
    val df = graft.ops.EventQueries.q137AudioHash(spark, SparkTestSession.sf)
    val row = df.filter(col("doc_id") === 1L).collect().head
    val env = Array.tabulate[Long](65)(i => mix(1L * 65 + i + 1))
    assert(row.getAs[Long]("ehash") == AudioCore.eHashFromEnergies(env))
  }
}
