package graft.functions

import java.awt.image.BufferedImage

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Real image codecs as native Catalyst expressions over `binary`
  * payload columns — JDK-only (`javax.imageio` ships PNG/BMP/JPEG/GIF
  * readers in every JRE, so no external libraries are assumed):
  *
  *   - `image_meta(binary)  -> struct<width:int,height:int,channels:int>`
  *   - `ahash64(binary)     -> bigint`  (average-hash over an 8×8 grid)
  *   - `dhash64(binary)     -> bigint`  (gradient-hash over a 9×8 grid)
  *   - `ahash64_gray(array<bigint>) -> bigint`  (64 cells, hash math only)
  *   - `dhash64_gray(array<bigint>) -> bigint`  (72 cells, hash math only)
  *
  * The decode expressions return NULL for undecodable bytes (corrupt
  * rows must not kill a 100 TB scan — filter `IS NULL` to quarantine
  * them); the `_gray` variants are the pure integer hash arithmetic
  * factored out so the DuckDB oracle can replay it over fixture-derived
  * pixel grids (the parquet fixtures carry no real image bytes — real
  * decode is spec-verified against synthesized PNG/BMP/JPEG payloads).
  *
  * Hash definitions (integer-exact, engine-portable — no float mean):
  *   aHash: cell luminances v₀..v₆₃ (row-major 8×8 block means), bit i
  *     set iff vᵢ·64 ≥ Σv — the scaled-integer form of "above average".
  *   dHash: 9 columns × 8 rows of block means, bit (r·8+c) set iff
  *     v[r·9+c+1] > v[r·9+c] — horizontal gradient signs.
  *
  * Scale: decode cost is per-row CPU on executors, no shuffle; the
  * expressions codegen as one static call each (the [[SimHash64]]
  * pattern) so they sit inside whole-stage codegen rather than
  * breaking the span. Near-dup over the hashes reuses the SimHash
  * band-join machinery ([[graft.operators.Multimodal.imageNearDupPairs]])
  * — hamming ≤ t pairs meet in ≥ 1 of (t+1) 16-bit bands by
  * pigeonhole, never an O(n²) comparison. */
object ImageCore {
  // ImageIO's default scratch-file cache turns every decode into disk
  // I/O on the executor — in-memory streams only.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decode or null — never throw: a corrupt payload is data, not a
    * bug, and one bad row must not fail a 100 TB stage. */
  def decode(bytes: Array[Byte]): BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: Exception => null }

  /** (width, height, channels) as an InternalRow, or null. Channels
    * from the color model (1 gray, 3 RGB, 4 ARGB). */
  def metaRow(bytes: Array[Byte]): GenericInternalRow = {
    val img = decode(bytes)
    if (img == null) null
    else new GenericInternalRow(Array[Any](
      img.getWidth, img.getHeight, img.getColorModel.getNumComponents))
  }

  /** Row-major gw×gh grid of integer block-mean luminances. Blocks
    * partition the image by the i·dim/grid integer lattice; images
    * smaller than the grid repeat edge pixels (x1 forced past x0) so
    * every cell is defined. Luminance is the integer Rec.601 weighting
    * (299·R + 587·G + 114·B)/1000 over sRGB values from `getRGB` —
    * deterministic for the JDK's PNG/BMP decoders. */
  def grayGrid(img: BufferedImage, gw: Int, gh: Int): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Long](gw * gh)
    var r = 0
    while (r < gh) {
      val y0 = (r.toLong * h / gh).toInt
      val y1 = math.max(y0 + 1, ((r + 1).toLong * h / gh).toInt)
      var c = 0
      while (c < gw) {
        val x0 = (c.toLong * w / gw).toInt
        val x1 = math.max(x0 + 1, ((c + 1).toLong * w / gw).toInt)
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            n += 1
            x += 1
          }
          y += 1
        }
        out(r * gw + c) = if (n == 0) 0L else sum / n
        c += 1
      }
      r += 1
    }
    out
  }

  /** aHash bit assembly over exactly 64 cells (bit i = cell i). */
  def aHashFromCells(cells: Array[Long]): Long = {
    require(cells.length == 64, s"ahash needs 64 cells, got ${cells.length}")
    var total = 0L
    var i = 0
    while (i < 64) { total += cells(i); i += 1 }
    var out = 0L
    i = 0
    while (i < 64) {
      if (cells(i) * 64L >= total) out |= (1L << i)
      i += 1
    }
    out
  }

  /** dHash bit assembly over exactly 72 cells (9 wide × 8 tall). */
  def dHashFromCells(cells: Array[Long]): Long = {
    require(cells.length == 72, s"dhash needs 72 cells, got ${cells.length}")
    var out = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c + 1) > cells(r * 9 + c)) out |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    out
  }

  /** Boxed so generated code can branch on decode failure. */
  def aHash(bytes: Array[Byte]): java.lang.Long = {
    val img = decode(bytes)
    if (img == null) null
    else java.lang.Long.valueOf(aHashFromCells(grayGrid(img, 8, 8)))
  }

  def dHash(bytes: Array[Byte]): java.lang.Long = {
    val img = decode(bytes)
    if (img == null) null
    else java.lang.Long.valueOf(dHashFromCells(grayGrid(img, 9, 8)))
  }

  def cellsOf(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = arr.getLong(i); i += 1 }
    out
  }

  def aHashGray(arr: ArrayData): Long = aHashFromCells(cellsOf(arr))
  def dHashGray(arr: ArrayData): Long = dHashFromCells(cellsOf(arr))
}

/** Shared shape for the two binary→bigint hash expressions: null on
  * decode failure, one static call in generated code. */
abstract class BinaryImageHash extends UnaryExpression {
  def staticCall: String
  def evalBytes(bytes: Array[Byte]): java.lang.Long

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""java.lang.Long $boxed = $staticCall($c);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();""".stripMargin
    })
}

case class AHash64(child: Expression) extends BinaryImageHash {
  override def staticCall: String = "graft.functions.ImageCore.aHash"
  override def evalBytes(bytes: Array[Byte]): java.lang.Long = ImageCore.aHash(bytes)
  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
  override def prettyName: String = "ahash64"
}

object AHash64 {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "ahash64", classOf[AHash64])
}

case class DHash64(child: Expression) extends BinaryImageHash {
  override def staticCall: String = "graft.functions.ImageCore.dHash"
  override def evalBytes(bytes: Array[Byte]): java.lang.Long = ImageCore.dHash(bytes)
  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
  override def prettyName: String = "dhash64"
}

object DHash64 {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "dhash64", classOf[DHash64])
}

/** `image_meta(binary) -> struct<width,height,channels>` — header-level
  * metadata via a full decode (ImageIO readers parse the header first;
  * a dims-only fast path would be codec-specific parsing for no
  * correctness gain here). Null for undecodable payloads. */
case class ImageMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_meta requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ImageCore.metaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ImageCore.metaRow($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
  override def prettyName: String = "image_meta"
}

object ImageMeta {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "image_meta", classOf[ImageMeta])
}

/** Pure hash arithmetic over a precomputed luminance grid — the
  * oracle-replayable core (cell count is data, so a wrong-sized array
  * is a real error, not a null). */
abstract class GrayHash extends UnaryExpression {
  def compute(arr: ArrayData): Long

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))
}

case class AHash64Gray(child: Expression) extends GrayHash {
  override def compute(arr: ArrayData): Long = ImageCore.aHashGray(arr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ImageCore.aHashGray($c);")
  override protected def withNewChildInternal(newChild: Expression): AHash64Gray =
    copy(child = newChild)
  override def prettyName: String = "ahash64_gray"
}

object AHash64Gray {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "ahash64_gray", classOf[AHash64Gray])
}

case class DHash64Gray(child: Expression) extends GrayHash {
  override def compute(arr: ArrayData): Long = ImageCore.dHashGray(arr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ImageCore.dHashGray($c);")
  override protected def withNewChildInternal(newChild: Expression): DHash64Gray =
    copy(child = newChild)
  override def prettyName: String = "dhash64_gray"
}

object DHash64Gray {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "dhash64_gray", classOf[DHash64Gray])
}
