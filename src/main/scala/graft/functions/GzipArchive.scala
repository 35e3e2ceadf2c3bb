package graft.functions

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compressed web-crawl ingestion primitives — the member-level gzip
  * codec under [[graft.sources.WebArchive]].
  *
  * A Common-Crawl WET/WARC file is a CONCATENATION of independent
  * gzip members, one crawl record per member (the multi-member form
  * RFC 1952 §2.2 defines and every crawl toolchain emits), so the
  * unit of parallelism at 100 TB is the member, not the file:
  * `gzip_members` splits an archive payload into per-member rows
  * carrying provenance (byte offset + compressed length — exactly
  * what a WARC index/cluster.idx records) and `gzip_member` builds
  * one member, giving specs and oracles a closed deterministic
  * round trip.
  *
  * Both are JDK-native (`Inflater`/`Deflater` — the [[DeflateLenCore]]
  * stance: the JDK delegates to its bundled zlib, no new
  * dependencies) and streaming per member: memory is one member's
  * decompressed bytes, never the whole archive inflated at once.
  *
  * Corruption is DATA, not an error (the decodeImage quarantine
  * convention): a member that fails its header parse, DEFLATE stream,
  * CRC32, or ISIZE check yields a row with a null payload and a
  * non-null `err`, covering the rest of the archive — after a corrupt
  * member the following member boundary is unknowable (gzip has no
  * resync marker), so scanning on is guesswork and the remainder is
  * quarantined in one row. Two zip-bomb guards bound worst-case
  * memory deterministically: a member inflating past
  * [[GzipArchiveCore.MaxMemberBytes]] or an archive row inflating
  * past [[GzipArchiveCore.MaxTotalBytes]] quarantines the remainder
  * the same way.
  */
object GzipArchiveCore {

  /** Per-member decompressed-size cap (bytes). A WET record is a web
    * page's extracted text — tens of KB typical, MBs exceptional; a
    * member claiming half a GiB is a bomb, not a document. */
  val MaxMemberBytes: Long = 256L * 1024 * 1024

  /** Per-archive-row decompressed budget (bytes): bounds one task's
    * allocation whatever the member count. */
  val MaxTotalBytes: Long = 1024L * 1024 * 1024

  /** Per-member decompressed ceiling for the PAYLOAD-FREE index pass.
    * Memory there is constant regardless, but CPU is not: a crafted
    * bomb member (KBs compressed, TBs decompressed) would spin one
    * indexing task for hours. Far looser than [[MaxMemberBytes]] —
    * the index pass exists precisely to admit archives the whole-file
    * budget rejects — but finite, so untrusted crawl input cannot buy
    * unbounded CPU with a constant-size payload. */
  val MaxIndexMemberBytes: Long = 64L * 1024 * 1024 * 1024

  val memberSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("clen", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("err", StringType, nullable = true)))

  private def row(idx: Int, offset: Long, clen: Long,
                  payload: Array[Byte], err: String): GenericInternalRow =
    new GenericInternalRow(Array[Any](idx, offset, clen, payload,
      if (err == null) null else UTF8String.fromString(err)))

  /** RFC 1952 header: returns the offset of the DEFLATE stream, or −1
    * if the header is malformed/truncated. */
  private def headerEnd(b: Array[Byte], start: Int): Int = {
    if (start + 10 > b.length) return -1
    if ((b(start) & 0xff) != 0x1f || (b(start + 1) & 0xff) != 0x8b) return -1
    if ((b(start + 2) & 0xff) != 8) return -1 // CM must be DEFLATE
    val flg = b(start + 3) & 0xff
    var p = start + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      if (p + 2 > b.length) return -1
      val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      p += 2 + xlen
      if (p > b.length) return -1
    }
    if ((flg & 0x08) != 0) { // FNAME, zero-terminated
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 0x02) != 0) { // FHCRC
      p += 2
      if (p > b.length) return -1
    }
    p
  }

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** Split a concatenated-gzip archive into member rows, with the
    * default bomb caps. */
  def members(bytes: Array[Byte]): GenericArrayData =
    members(bytes, MaxMemberBytes, MaxTotalBytes)

  /** Split with caller-supplied caps — the PER-SLICE dials of the
    * offset-splittable ingest: when a >MaxTotalBytes archive is fanned
    * out as per-member slices ([[graft.sources.WebArchive.sliceMembers]]),
    * each slice row pays its own budget, so the whole archive ingests
    * without ever relaxing the per-task memory bound. */
  def members(bytes: Array[Byte], maxMemberBytes: Long,
              maxTotalBytes: Long): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[GenericInternalRow]
    var pos = 0
    var idx = 0
    var total = 0L
    var halted = false
    while (!halted && pos < bytes.length) {
      val rest = (bytes.length - pos).toLong
      def quarantine(msg: String): Unit = {
        out += row(idx, pos.toLong, rest, null, msg)
        halted = true // no resync marker past a broken member
      }
      val dataStart = headerEnd(bytes, pos)
      if (dataStart < 0) quarantine("malformed or truncated gzip header")
      else {
        val inf = new Inflater(true) // nowrap: header handled above
        try {
          inf.setInput(bytes, dataStart, bytes.length - dataStart)
          val sink = new java.io.ByteArrayOutputStream(8192)
          val buf = new Array[Byte](65536)
          var failed: String = null
          var done = false
          while (!done && failed == null) {
            val n =
              try inf.inflate(buf)
              catch { case _: DataFormatException =>
                failed = "corrupt DEFLATE stream"; 0 }
            if (failed == null) {
              if (n > 0) {
                sink.write(buf, 0, n)
                if (sink.size() > maxMemberBytes)
                  failed = s"member exceeds $maxMemberBytes decompressed bytes"
                else if (total + sink.size() > maxTotalBytes)
                  failed = s"archive exceeds $maxTotalBytes decompressed bytes"
              } else if (inf.finished()) done = true
              else failed = "truncated DEFLATE stream" // needs input we don't have
            }
          }
          if (failed != null) quarantine(failed)
          else {
            val trailer = dataStart + inf.getBytesRead.toInt
            if (trailer + 8 > bytes.length) quarantine("truncated gzip trailer")
            else {
              val payload = sink.toByteArray
              val crc = new CRC32
              crc.update(payload, 0, payload.length)
              if (le32(bytes, trailer) != crc.getValue)
                quarantine("gzip CRC32 mismatch")
              else if (le32(bytes, trailer + 4) != (payload.length & 0xffffffffL))
                quarantine("gzip ISIZE mismatch")
              else {
                val end = trailer + 8
                out += row(idx, pos.toLong, (end - pos).toLong, payload, null)
                total += payload.length
                pos = end
                idx += 1
              }
            }
          }
        } finally inf.end() // frees native zlib state promptly
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  val indexSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("clen", LongType, nullable = false),
    StructField("ulen", LongType, nullable = false),
    StructField("err", StringType, nullable = true)))

  private def idxRow(idx: Int, offset: Long, clen: Long, ulen: Long,
                     err: String): GenericInternalRow =
    new GenericInternalRow(Array[Any](idx, offset, clen, ulen,
      if (err == null) null else UTF8String.fromString(err)))

  /** Member INDEX of a concatenated-gzip archive — (idx, offset, clen,
    * ulen, err) per member, NO payloads: the cluster.idx builder. The
    * scan is streaming per member (CRC32 and length accumulate over
    * the inflate buffer, nothing is retained), so memory is one 64 KiB
    * buffer REGARDLESS of archive or member size — which is why this
    * pass needs no bomb caps: there is no allocation for a bomb to
    * blow up. A multi-GiB-decompressed archive that [[members]] would
    * cap-quarantine indexes fine here; the caps then apply per SLICE
    * on the fan-out read. The one cap that DOES apply is the CPU-side
    * bomb ceiling `maxUlen` (default [[MaxIndexMemberBytes]]): memory
    * is constant whatever the member inflates to, but the inflate
    * LOOP is not, so a member past the ceiling quarantines the
    * remainder like any other corruption. Corruption quarantines the
    * remainder as one err row, same contract as [[members]]. */
  def memberIndex(bytes: Array[Byte]): GenericArrayData =
    memberIndex(bytes, MaxIndexMemberBytes)

  def memberIndex(bytes: Array[Byte], maxUlen: Long): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[GenericInternalRow]
    var pos = 0
    var idx = 0
    var halted = false
    while (!halted && pos < bytes.length) {
      val rest = (bytes.length - pos).toLong
      def quarantine(msg: String): Unit = {
        out += idxRow(idx, pos.toLong, rest, 0L, msg)
        halted = true
      }
      val dataStart = headerEnd(bytes, pos)
      if (dataStart < 0) quarantine("malformed or truncated gzip header")
      else {
        val inf = new Inflater(true)
        try {
          inf.setInput(bytes, dataStart, bytes.length - dataStart)
          val crc = new CRC32
          var ulen = 0L
          val buf = new Array[Byte](65536)
          var failed: String = null
          var done = false
          while (!done && failed == null) {
            val n =
              try inf.inflate(buf)
              catch { case _: DataFormatException =>
                failed = "corrupt DEFLATE stream"; 0 }
            if (failed == null) {
              if (n > 0) {
                crc.update(buf, 0, n); ulen += n
                if (ulen > maxUlen)
                  failed = s"member exceeds $maxUlen decompressed bytes (index cap)"
              }
              else if (inf.finished()) done = true
              else failed = "truncated DEFLATE stream"
            }
          }
          if (failed != null) quarantine(failed)
          else {
            val trailer = dataStart + inf.getBytesRead.toInt
            if (trailer + 8 > bytes.length) quarantine("truncated gzip trailer")
            else if (le32(bytes, trailer) != crc.getValue)
              quarantine("gzip CRC32 mismatch")
            else if (le32(bytes, trailer + 4) != (ulen & 0xffffffffL))
              quarantine("gzip ISIZE mismatch")
            else {
              val end = trailer + 8
              out += idxRow(idx, pos.toLong, (end - pos).toLong, ulen, null)
              pos = end
              idx += 1
            }
          }
        } finally inf.end()
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Build ONE gzip member with fixed dials — level 6, MTIME 0, no
    * name/comment, OS 255 — so the bytes are a pure function of the
    * input for a given zlib build (the [[DeflateLenCore]] determinism
    * contract; round-trip CONTENT is engine-independent either way). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val sink = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
      sink.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
      val buf = new Array[Byte](65536)
      while (!d.finished()) {
        val n = d.deflate(buf)
        sink.write(buf, 0, n)
      }
      val crc = new CRC32
      crc.update(bytes, 0, bytes.length)
      val tail = new Array[Byte](8)
      val c = crc.getValue
      val isize = bytes.length & 0xffffffffL
      var i = 0
      while (i < 4) {
        tail(i) = ((c >>> (8 * i)) & 0xff).toByte
        tail(4 + i) = ((isize >>> (8 * i)) & 0xff).toByte
        i += 1
      }
      sink.write(tail)
      sink.toByteArray
    } finally d.end()
  }
}

/** `gzip_members(binary[, max_member[, max_total]]) ->
  * array<struct<idx,offset,clen,payload,err>>` — the cap operands are
  * the PER-ROW bomb dials (defaults [[GzipArchiveCore.MaxMemberBytes]]
  * / [[GzipArchiveCore.MaxTotalBytes]]); the sliced ingest passes its
  * per-slice budgets here. */
case class GzipMembers(child: Expression,
                       maxMemberBytes: Long = GzipArchiveCore.MaxMemberBytes,
                       maxTotalBytes: Long = GzipArchiveCore.MaxTotalBytes)
  extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(GzipArchiveCore.memberSchema, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if maxMemberBytes > 0 && maxTotalBytes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"gzip_members caps must be positive, got ($maxMemberBytes, $maxTotalBytes)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"gzip_members requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    GzipArchiveCore.members(input.asInstanceOf[Array[Byte]],
      maxMemberBytes, maxTotalBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GzipArchiveCore.members($c, " +
        s"${maxMemberBytes}L, ${maxTotalBytes}L);")

  override protected def withNewChildInternal(newChild: Expression): GzipMembers =
    copy(child = newChild)
  override def prettyName: String = "gzip_members"
}

object GzipMembers {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "gzip_members", classOf[GzipMembers])
}

/** `gzip_member_index(binary[, max_ulen]) ->
  * array<struct<idx,offset,clen,ulen,err>>` — payload-free streaming
  * member index (constant memory; see
  * [[GzipArchiveCore.memberIndex]]); `max_ulen` is the CPU-side bomb
  * ceiling, default [[GzipArchiveCore.MaxIndexMemberBytes]]. */
case class GzipMemberIdx(child: Expression,
                         maxUlen: Long = GzipArchiveCore.MaxIndexMemberBytes)
  extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(GzipArchiveCore.indexSchema, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if maxUlen > 0 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"gzip_member_index max_ulen must be positive, got $maxUlen")
    case other => TypeCheckResult.TypeCheckFailure(
      s"gzip_member_index requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    GzipArchiveCore.memberIndex(input.asInstanceOf[Array[Byte]], maxUlen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GzipArchiveCore.memberIndex($c, ${maxUlen}L);")

  override protected def withNewChildInternal(newChild: Expression): GzipMemberIdx =
    copy(child = newChild)
  override def prettyName: String = "gzip_member_index"
}

object GzipMemberIdx {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "gzip_member_index", classOf[GzipMemberIdx])
}

/** `gzip_member(binary) -> binary` — the builder half of the round trip. */
case class GzipMemberEnc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gzip_member requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    GzipArchiveCore.gzipMember(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GzipArchiveCore.gzipMember($c);")

  override protected def withNewChildInternal(newChild: Expression): GzipMemberEnc =
    copy(child = newChild)
  override def prettyName: String = "gzip_member"
}

object GzipMemberEnc {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "gzip_member", classOf[GzipMemberEnc])
}
