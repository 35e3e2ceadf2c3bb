package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventQueries
import graft.operators.TextAnalysis

/** Round-11 closures of the round-9/10 advice items: the MG
  * certificate must emit a zeros row (not drop the group) when a
  * summary decrement-cancels to empty, and proximityMinSpan must
  * handle any slot arity — N-term frames generalize, out-of-range
  * slots raise instead of silently truncating to three terms.
  */
class Round11Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------- q162 empty-summary row

  test("mgCertificate: a decrement-cancelled (empty) summary still emits its zeros row") {
    // group "a": k+1 = 9 distinct singletons — inserts fill the 8
    // counters, the 9th decrements all to zero, summary comes back
    // EMPTY on every partitioning (exact partials merge to 9 ones,
    // the merge reduction subtracts the 9th-largest = 1). The
    // certificate row must survive with all theorem columns 0.
    // group "b": one heavy key among 12 rows — the normal regime,
    // certifying both shapes coexist in one frame.
    val rows =
      (0L until 9L).map(k => ("a", k)) ++
        Seq.fill(10)(("b", 1L)) ++ Seq(("b", 2L), ("b", 3L))
    val keyed = rows.toDF("event_type", "key").repartition(3)
    val got = EventQueries.mgCertificate(keyed, k = 8)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 9L, 0L, 0L, 0L, 0L),
      ("b", 12L, 1L, 1L, 0L, 0L)))
  }

  // ------------------------------------------------ proximity slot arity

  test("proximityMinSpan: 2-term and 4-term arities compute true minimal spans") {
    val slots2 = Seq((0, "a"), (1, "b")).toDF("slot", "term")
    val docs2 = Seq(
      (1L, "a x x b"),      // single combo: 3
      (2L, "b x a b a"),    // (2,3) beats (2,0)/(4,*): 1
      (3L, "a x x x a")     // b missing -> absent
    ).toDF("doc_id", "text")
    val got2 = TextAnalysis.proximityMinSpan(docs2, slots2, k = 16, numTerms = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got2 == Seq((1L, 3L), (2L, 1L)))

    val slots4 = Seq((0, "t0"), (1, "t1"), (2, "t2"), (3, "t3"))
      .toDF("slot", "term")
    val docs4 = Seq(
      (1L, "t0 t1 t2 t3"),             // 3
      (2L, "t0 x t1 t2 x x t3 t0"),    // combo (7,2,3,6) spans 5, beats (0,..,6)'s 6
      (3L, "t0 t1 t2 x x x x x x t0")  // t3 missing -> absent
    ).toDF("doc_id", "text")
    val got4 = TextAnalysis.proximityMinSpan(docs4, slots4, k = 16, numTerms = 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got4 == Seq((1L, 3L), (2L, 5L)))
  }

  test("proximityMinSpan: a slot outside the declared arity raises, not plausible-wrong spans") {
    // A 4-term slot frame against the default numTerms = 3 used to
    // silently ignore slot 3 and return 3-term spans; now the guard
    // in the pos projection raises as soon as a slot-3 token matches.
    val slots4 = Seq((0, "t0"), (1, "t1"), (2, "t2"), (3, "t3"))
      .toDF("slot", "term")
    val docs = Seq((1L, "t0 t1 t2 t3")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.proximityMinSpan(docs, slots4, k = 16).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("slot outside 0..2")))
  }

  test("proximityMinSpan: arity dials that explode the in-row combo budget are rejected") {
    val slots = Seq((0, "a"), (1, "b")).toDF("slot", "term")
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.proximityMinSpan(docs, slots, k = 64, numTerms = 4)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.proximityMinSpan(docs, slots, k = 16, numTerms = 1)
    }
  }
}
