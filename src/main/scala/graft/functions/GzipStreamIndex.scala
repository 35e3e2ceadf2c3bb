package graft.functions

import java.util.zip.{CRC32, DataFormatException, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** STREAMING member index over a file path — the builder half of the
  * no-whole-file archive story ([[FileRangeRead]] is the reader half):
  * `gzip_member_index` already scans member-streaming, but its input
  * is a whole-file BINARY row (`binaryFile` materializes the entire
  * compressed archive in memory, int-indexed, 2 GiB-bound). This
  * expression opens the PATH through the Hadoop FileSystem and indexes
  * through a bounded rolling window (~128 KiB + one inflate buffer),
  * so building cluster.idx for a 100 GB crawl file costs the same
  * memory as for a 1 MB one. With it, NO stage of the archive
  * pipeline ever holds a whole file: index by streaming the path,
  * read members by byte range.
  *
  * Row-for-row IDENTICAL output to [[GzipArchiveCore.memberIndex]]
  * (same offsets, lengths, CRC/ISIZE checks, bomb ceiling, and
  * quarantine messages — spec-pinned equal on intact, corrupt,
  * truncated, and over-ceiling archives). I/O failures (missing file,
  * permission, mid-read errors) quarantine as a row, never throw. */
object GzipStreamIndexCore {

  /** Header fields are tiny in practice (FEXTRA ≤ 64 KiB by format;
    * FNAME/FCOMMENT unbounded only in theory) — a header that does not
    * fit this window is hostile input and quarantines. */
  private val MaxHeaderBytes = 128 * 1024

  private def idxRow(idx: Int, offset: Long, clen: Long, ulen: Long,
                     err: String) =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](idx, offset, clen, ulen,
        if (err == null) null else UTF8String.fromString(err)))

  /** Bounded rolling window over an InputStream with absolute-offset
    * bookkeeping: `base` is the absolute file offset of `buf(0)`,
    * `len` the valid bytes, `eof` whether the source is drained. */
  private final class Window(in: java.io.InputStream) {
    var buf = new Array[Byte](256 * 1024)
    var base = 0L
    var len = 0
    var eof = false

    /** Pull until at least `absEnd − base` bytes are valid or EOF;
      * returns whether the range is fully available. */
    def ensureAbs(absEnd: Long): Boolean = {
      val need = absEnd - base
      if (need > buf.length) grow(need)
      while (len < need && !eof) pull()
      len >= need
    }
    private def grow(need: Long): Unit = {
      require(need <= Int.MaxValue - 16, "window bound exceeded")
      val n = new Array[Byte](java.lang.Math.max(buf.length * 2, need.toInt))
      System.arraycopy(buf, 0, n, 0, len)
      buf = n
    }
    def pull(): Unit = {
      if (eof) return
      if (len == buf.length) grow(len.toLong + 65536)
      val n = in.read(buf, len, buf.length - len)
      if (n < 0) eof = true else len += n
    }
    /** Drop consumed bytes below absolute offset `abs`. */
    def dropBelow(abs: Long): Unit = {
      val k = (abs - base).toInt
      if (k > 0) {
        System.arraycopy(buf, k, buf, 0, len - k)
        len -= k
        base = abs
      }
    }
    def byteAt(abs: Long): Int = buf((abs - base).toInt) & 0xff
    def availAbs: Long = base + len
    /** Count the remaining bytes from `abs` to EOF (drains the
      * source) — quarantine rows report the remainder's length, the
      * [[GzipArchiveCore.memberIndex]] contract. */
    def remainingFrom(abs: Long): Long = {
      var total = availAbs - abs
      val sink = new Array[Byte](65536)
      var n = 0
      while ({ n = in.read(sink); n >= 0 }) total += n
      eof = true
      total
    }
  }

  /** RFC 1952 header over the window: returns the absolute offset of
    * the DEFLATE stream, −1 if malformed/truncated/oversized. */
  private def headerEnd(w: Window, start: Long): Long = {
    if (!w.ensureAbs(start + 10)) return -1
    if (w.byteAt(start) != 0x1f || w.byteAt(start + 1) != 0x8b) return -1
    if (w.byteAt(start + 2) != 8) return -1
    val flg = w.byteAt(start + 3)
    var p = start + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      if (!w.ensureAbs(p + 2)) return -1
      val xlen = w.byteAt(p) | (w.byteAt(p + 1) << 8)
      p += 2 + xlen
      if (!w.ensureAbs(p)) return -1
    }
    var f = 0x08 // FNAME then FCOMMENT, both zero-terminated
    while (f <= 0x10) {
      if ((flg & f) != 0) {
        var done = false
        while (!done) {
          if (p - start > MaxHeaderBytes) return -1
          if (!w.ensureAbs(p + 1)) return -1
          if (w.byteAt(p) == 0) done = true
          p += 1
        }
      }
      f <<= 1
    }
    if ((flg & 0x02) != 0) { // FHCRC
      p += 2
      if (!w.ensureAbs(p)) return -1
    }
    p
  }

  private def le32(w: Window, p: Long): Long =
    w.byteAt(p) | (w.byteAt(p + 1).toLong << 8) |
      (w.byteAt(p + 2).toLong << 16) | (w.byteAt(p + 3).toLong << 24)

  def indexStream(in: java.io.InputStream, maxUlen: Long): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
    val w = new Window(in)
    var pos = 0L
    var idx = 0
    var halted = false
    w.pull()
    while (!halted && (pos < w.availAbs || !w.eof)) {
      if (pos >= w.availAbs) w.pull()
      if (pos >= w.availAbs && w.eof) halted = true
      else {
        def quarantine(msg: String): Unit = {
          out += idxRow(idx, pos, w.remainingFrom(pos), 0L, msg)
          halted = true
        }
        val dataStart = headerEnd(w, pos)
        if (dataStart < 0) quarantine("malformed or truncated gzip header")
        else {
          val inf = new Inflater(true)
          try {
            val crc = new CRC32
            var ulen = 0L
            val obuf = new Array[Byte](65536)
            var fedThrough = dataStart // absolute offset past the last setInput slice
            var failed: String = null
            var done = false
            while (!done && failed == null) {
              if (inf.needsInput()) {
                // everything fed so far is consumed (needsInput ⇒
                // remaining == 0) — drop it so a multi-GB member's
                // compressed bytes never accumulate in the window;
                // offsets stay numeric (remainingFrom/ensureAbs are
                // absolute-offset arithmetic, not buffer positions)
                w.dropBelow(fedThrough)
                if (fedThrough >= w.availAbs) w.pull()
                if (fedThrough >= w.availAbs) failed = "truncated DEFLATE stream"
                else {
                  val from = (fedThrough - w.base).toInt
                  inf.setInput(w.buf, from, w.len - from)
                  fedThrough = w.base + w.len
                }
              }
              if (failed == null) {
                val n =
                  try inf.inflate(obuf)
                  catch { case _: DataFormatException =>
                    failed = "corrupt DEFLATE stream"; 0 }
                if (failed == null) {
                  if (n > 0) {
                    crc.update(obuf, 0, n); ulen += n
                    if (ulen > maxUlen)
                      failed = s"member exceeds $maxUlen decompressed bytes (index cap)"
                  } else if (inf.finished()) done = true
                  else if (inf.needsDictionary())
                    failed = "corrupt DEFLATE stream"
                  // else: needsInput — loop feeds the next slice
                }
              }
            }
            if (failed != null) quarantine(failed)
            else {
              val trailer = dataStart + inf.getBytesRead
              if (!w.ensureAbs(trailer + 8)) quarantine("truncated gzip trailer")
              else if (le32(w, trailer) != crc.getValue)
                quarantine("gzip CRC32 mismatch")
              else if (le32(w, trailer + 4) != (ulen & 0xffffffffL))
                quarantine("gzip ISIZE mismatch")
              else {
                val end = trailer + 8
                out += idxRow(idx, pos, end - pos, ulen, null)
                pos = end
                idx += 1
                w.dropBelow(pos)
              }
            }
          } finally inf.end()
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Open `path` through the Hadoop FileSystem (the [[FileRangeCore]]
    * conventions: scheme-transparent, session `fs.*` overrides, I/O
    * failure is a quarantine row) and stream-index it. */
  def indexPath(path: UTF8String, maxUlen: Long,
                fsConf: Seq[(String, String)]): GenericArrayData =
    try {
      val p = new org.apache.hadoop.fs.Path(path.toString)
      val fs = p.getFileSystem(FileRangeCore.hadoopConf(fsConf))
      val in = fs.open(p)
      try indexStream(in, maxUlen) finally in.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        new GenericArrayData(Array[Any](idxRow(0, 0L, 0L, 0L,
          s"index open failed: ${e.getClass.getSimpleName}: ${e.getMessage}")))
    }
}

/** `gzip_index_path(path STRING[, max_ulen BIGINT]) ->
  * array<struct<idx,offset,clen,ulen,err>>` — the streaming path form
  * of `gzip_member_index`; see [[GzipStreamIndexCore]]. */
case class GzipIndexPath(child: Expression,
                         maxUlen: Long = GzipArchiveCore.MaxIndexMemberBytes,
                         fsConf: Seq[(String, String)] =
                           FileRangeCore.activeFsConf())
  extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(GzipArchiveCore.indexSchema, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if maxUlen > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"gzip_index_path max_ulen must be positive, got $maxUlen")
    case other => TypeCheckResult.TypeCheckFailure(
      s"gzip_index_path requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    GzipStreamIndexCore.indexPath(input.asInstanceOf[UTF8String], maxUlen, fsConf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conf = ctx.addReferenceObj("fsConf", fsConf,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GzipStreamIndexCore.indexPath($c, " +
        s"${maxUlen}L, $conf);")
  }

  override protected def withNewChildInternal(newChild: Expression): GzipIndexPath =
    copy(child = newChild)
  override def prettyName: String = "gzip_index_path"
}

object GzipIndexPath {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "gzip_index_path", classOf[GzipIndexPath])
}
