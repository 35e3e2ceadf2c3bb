package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `mix64_fold(array<bigint>, seed) -> bigint`: left fold of the
  * splitmix64 finalizer over an array — `h ← mix(h xor e)` from
  * `h = seed` — the LSH BAND combiner ([[graft.operators.Dedup
  * .minHashPairs]] hashes each band's minhash rows into one bucket
  * key with it).
  *
  * It replaced `xxhash64(band, sig…)` in round 16 NOT for speed
  * (both are one codegen'd call) but for ORACLE REPLAYABILITY:
  * xxHash64's streaming block algorithm is impractical to restate in
  * a single DuckDB SQL statement, while this fold is four lines of
  * HUGEINT modular arithmetic — which is what promoted q35 from a
  * rows-only row to a full cross-engine hash gate. Same mixer as
  * [[MinHashSigs]] (full-avalanche splitmix64 finalizer), so bucket
  * quality is unchanged; the agreement oracles (q60/q61) re-certify
  * recall against exact Jaccard under the new buckets. */
case class Mix64Fold(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mix64_fold requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Mix64Fold.compute(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Mix64Fold.compute($c, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Mix64Fold =
    copy(child = newChild)
  override def prettyName: String = "mix64_fold"
}

object Mix64Fold {
  /** splitmix64 finalizer (the [[MinHashSigs]] mixer, shared shape). */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(arr: ArrayData, seed: Long): Long = {
    var h = seed
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      h = mix(h ^ arr.getLong(i))
      i += 1
    }
    h
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "mix64_fold", classOf[Mix64Fold])
}
