package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Catalyst extension entry point: inject the engine's native SQL
  * functions at session build time via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — the integration path for SQL-only users and for clusters where
  * the session is constructed by infrastructure (Thrift server,
  * notebooks, spark-submit conf) rather than by [[GraftSession]].
  * Injected functions live in the session's registry exactly like
  * built-ins; `GraftSession.registerFunctions` remains the
  * programmatic equivalent and both routes share the validated
  * builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("simhash64", "simhash64(features array<bigint>) -> bigint") { exprs =>
      FunctionArgs.requireArity("simhash64", exprs, 1,
        "simhash64(features array<bigint>)")
      SimHash64(exprs.head)
    }
    inject("minhash_sigs", "minhash_sigs(features array<bigint>, k INT) -> array<bigint>") { exprs =>
      FunctionArgs.requireArity("minhash_sigs", exprs, 2,
        "minhash_sigs(features array<bigint>, k INT literal)")
      MinHashSigs(exprs.head, FunctionArgs.foldableInt("minhash_sigs", exprs(1), "k"))
    }
    inject("shingle_hashes", "shingle_hashes(text STRING, k INT) -> array<bigint>") { exprs =>
      FunctionArgs.requireArity("shingle_hashes", exprs, 2,
        "shingle_hashes(text STRING, k INT literal)")
      ShingleHashes(exprs.head, FunctionArgs.foldableInt("shingle_hashes", exprs(1), "k"))
    }
    inject("srp_buckets", "srp_buckets(vec array<float|double>, tables INT, bits INT, seed BIGINT) -> array<bigint>") { exprs =>
      FunctionArgs.requireArity("srp_buckets", exprs, 4,
        "srp_buckets(vec array<float|double>, tables INT, bits INT, seed BIGINT)")
      SrpBuckets(exprs.head,
        FunctionArgs.foldableInt("srp_buckets", exprs(1), "tables"),
        FunctionArgs.foldableInt("srp_buckets", exprs(2), "bits"),
        FunctionArgs.foldableLong("srp_buckets", exprs(3), "seed"))
    }
    inject("cosine_sim", "cosine_sim(a array<float|double>, b array<float|double>) -> double") { exprs =>
      FunctionArgs.requireArity("cosine_sim", exprs, 2,
        "cosine_sim(a array<float|double>, b array<float|double>)")
      CosineSim(exprs.head, exprs(1))
    }
    inject("bounded_min_k", "bounded_min_k(col BIGINT, k INT) -> array<bigint>") { exprs =>
      FunctionArgs.requireArity("bounded_min_k", exprs, 2,
        "bounded_min_k(col BIGINT, k INT literal)")
      BoundedMinK(exprs.head,
        FunctionArgs.foldableInt("bounded_min_k", exprs(1), "k"))
        .toAggregateExpression()
    }
  }
}
