package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, k) -> array<bigint>`: DISTINCT hashes of the
  * k-word shingles of a space-separated text, in one pass over the
  * bytes — no word array, no shingle strings, no per-element
  * interpreted lambdas. Returns an empty array for texts with < k
  * words.
  *
  * This feeds the LSH signature paths ([[MinHashSigs]], [[SimHash64]]):
  * they only ever hash the shingle strings, so building those strings
  * (split → transform → concat_ws, all interpreted) was pure overhead —
  * the dominant cost of the dedup benchmark after the earlier fixes.
  * Exact/oracle paths (n-gram Jaccard verification) keep real string
  * shingles; hash-collision risk there is semantic, here it is the
  * same approximation MinHash already makes.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"shingle_hashes requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  /** FNV-1a over a word's bytes, then splitmix-style avalanche. */
  @inline private def avalanche(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // 1st pass: hash each word (split on single space, like split(text,' '))
    val wordHashes = new java.util.ArrayList[java.lang.Long]()
    var h = 0xCBF29CE484222325L // FNV offset
    var sawAny = false
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        wordHashes.add(avalanche(h)); h = 0xCBF29CE484222325L; sawAny = true
      } else {
        h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L
      }
      i += 1
    }
    val w = wordHashes.size()
    if (!sawAny || w < k) return new GenericArrayData(Array.empty[Long])
    // 2nd pass: combine k consecutive word hashes, position-mixed
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var j = 0
    while (j <= w - k) {
      var c = 0x9E3779B97F4A7C15L
      var t = 0
      while (t < k) {
        c = avalanche(c ^ wordHashes.get(j + t).longValue() * (t + 1))
        t += 1
      }
      if (seen.add(c)) out.add(c)
      j += 1
    }
    val arr = new Array[Long](out.size())
    var m = 0
    while (m < out.size()) { arr(m) = out.get(m).longValue(); m += 1 }
    new GenericArrayData(arr)
  }

  /** Register `shingle_hashes` (idempotent); k must be a foldable literal. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "shingle_hashes", classOf[ShingleHashes])
}
