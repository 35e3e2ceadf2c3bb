package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level WARC record split — the header/body boundary finder that
  * makes BINARY bodies first-class: a crawl's response records carry
  * images/PDFs/archives, so the split must never decode the payload as
  * text (the string route either throws on invalid UTF-8 or desyncs
  * char indices from the byte offsets the Content-Length slice needs —
  * the round-11 advice findings). This runs entirely on bytes:
  *
  *  - the record must open with ASCII `WARC/` (ISO 28500 §4: the
  *    version line) — else err `not a WARC record`;
  *  - the header block ends at the first CRLFCRLF — absent, err
  *    `no header terminator`;
  *  - the header bytes must be VALID UTF-8 (WARC/1.0 §4 permits UTF-8
  *    header values — e.g. a non-ASCII WARC-Target-URI — and they are
  *    safe here because `hdr_end` is a BYTE offset consumed by a
  *    BINARY substring, so multi-byte chars can never shear the body
  *    slice; only undecodable bytes, which would corrupt every
  *    downstream regex over the header text, quarantine) — else err
  *    `invalid UTF-8 in header`;
  *  - on success: `hdr_end` = the 1-BASED byte position of the CRLF
  *    CRLF (drop-in for the old `instr(s, …)` contract: headers =
  *    bytes [0, hdr_end-1), body starts at byte hdr_end+4), plus the
  *    headers decoded as a (validated) UTF-8 string.
  */
object WarcSplitCore {

  val schema: StructType = StructType(Seq(
    StructField("hdr_end", IntegerType, nullable = true),
    StructField("headers", StringType, nullable = true),
    StructField("err", StringType, nullable = true)))

  private val Magic = "WARC/".getBytes("US-ASCII")

  private def row(hdrEnd: Any, headers: UTF8String, err: String) =
    new GenericInternalRow(Array[Any](hdrEnd, headers,
      if (err == null) null else UTF8String.fromString(err)))

  def split(bytes: Array[Byte]): GenericInternalRow = {
    if (bytes.length < Magic.length ||
      !java.util.Arrays.equals(bytes, 0, Magic.length, Magic, 0, Magic.length))
      return row(null, null, "not a WARC record")
    var i = 0
    var end = -1
    while (end < 0 && i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') end = i
      else i += 1
    }
    if (end < 0) return row(null, null, "no header terminator")
    val headers = UTF8String.fromBytes(bytes, 0, end)
    if (!headers.isValid) return row(null, null, "invalid UTF-8 in header")
    row(end + 1, headers, null)
  }
}

/** `warc_split(binary) -> struct<hdr_end int, headers string, err string>` */
case class WarcSplit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WarcSplitCore.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"warc_split requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WarcSplitCore.split(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WarcSplitCore.split($c);")

  override protected def withNewChildInternal(newChild: Expression): WarcSplit =
    copy(child = newChild)
  override def prettyName: String = "warc_split"
}

object WarcSplit {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "warc_split", classOf[WarcSplit])
}
