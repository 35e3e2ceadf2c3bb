package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `deflate_len(string) -> bigint` — the DEFLATE-compressed byte
  * length of a string's UTF-8 bytes, the primitive behind the
  * compression-ratio quality signal: natural prose compresses to
  * ~40–60% of its raw size, templated/boilerplate/repeated text far
  * below that, and random or already-compressed junk barely at all —
  * so `deflate_len(text) * 1000 div octet_length(text)` is a
  * one-number document-quality screen (the signal Rae et al.'s
  * Gopher pipeline and the RedPajama/CCNet lineage filter on) that
  * catches GLOBAL redundancy a bigram-concentration heuristic
  * (q47) or positional n-gram repetition (q139) cannot: a paragraph
  * pasted 10× compresses to ~1/10 whatever the bigram mix looks
  * like.
  *
  * Determinism: fixed dials — level 6, nowrap, one whole-input pass —
  * make the output a pure function of the bytes FOR A GIVEN zlib
  * build. The JDK delegates Deflater to its bundled zlib, so lengths
  * are stable within a JVM/OS image (this repo's driver and judge
  * replay on one image) but not a cross-engine contract — DuckDB
  * cannot replay them, so the q167 oracle is a FixtureId-guarded
  * pinned frame (the q60/q61 convention), not SQL arithmetic.
  *
  * Scale: one static call inside whole-stage codegen, no shuffle, no
  * allocation beyond a thread-local scratch `Deflater` (reset per
  * row — each construction otherwise allocates native zlib state)
  * and a 4 KiB sink buffer: the compressed bytes are DISCARDED as
  * they are produced; only the length survives, so memory is O(1)
  * per task whatever the document size. */
object DeflateLenCore {

  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val sinks = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](4096)
  }

  def deflatedLength(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val sink = sinks.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(sink)
    total
  }
}

case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    DeflateLenCore.deflatedLength(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLenCore.deflatedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)

  override def prettyName: String = "deflate_len"
}

object DeflateLen {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "deflate_len", classOf[DeflateLen])
}
