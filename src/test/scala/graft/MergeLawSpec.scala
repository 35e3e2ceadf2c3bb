package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BoundedMinK, BoundedMinKDistinct, BoundedMinKPairs, MisraGries}

/** Generator-driven merge laws for the native aggregate buffers —
  * round-9 item 7. The hand-picked split specs elsewhere exercise a
  * few partition trees; this suite drives the buffers DIRECTLY
  * (update/merge/serialize/deserialize, no Spark jobs) over random
  * data, random split shapes, and random merge orders, asserting the
  * laws Spark's partial-aggregation contract actually requires:
  *
  *  - BoundedMinK / Distinct / Pairs are EXACT operators — any split,
  *    any merge order, with or without a ser/de round trip per
  *    partial, must equal the single-buffer result, which must equal
  *    the reference `sorted.take(k)` (resp. distinct / lexicographic
  *    pairs).
  *  - MisraGries counter VALUES are legitimately order-dependent once
  *    decrements fire, so the fuzzed laws are its worst-case
  *    GUARANTEES (Misra & Gries 1982; Agarwal et al. PODS 2012 for
  *    the merge): never overestimate, residual underestimate bound,
  *    every (k+1)-heavy key present, ≤ k counters — on EVERY split
  *    and merge order.
  */
class MergeLawSpec extends AnyFunSuite {

  /** Deterministic mini-forAll (the PropertySpec convention: the
    * scalacheck/scalatest bridge isn't in the offline cache). */
  private def forAll[T](gen: Gen[T], n: Int = 40)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(1100L + i)).foreach(f)
    }

  /** Values with collisions (small domain) plus a heavy skew tail. */
  private val streamGen: Gen[(List[Long], Int)] = for {
    n <- Gen.chooseNum(0, 400)
    domain <- Gen.chooseNum(1, 40)
    vs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.chooseNum(0L, domain.toLong),
      1 -> Gen.const(7L), // a deliberately hot key
      1 -> Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)))
    k <- Gen.chooseNum(1, 24)
  } yield (vs, k)

  /** Random split into 1..8 runs + a random merge order. */
  private def splits[T](vs: List[T], seedI: Long): (Seq[List[T]], Seq[Int]) = {
    val rnd = new scala.util.Random(seedI)
    val nParts = 1 + rnd.nextInt(8)
    val parts = Array.fill(nParts)(List.newBuilder[T])
    vs.foreach(v => parts(rnd.nextInt(nParts)) += v)
    (parts.map(_.result()).toSeq, rnd.shuffle((0 until nParts).toList))
  }

  test("bounded_min_k: any split, any merge order, any ser/de = sorted.take(k), exactly") {
    val agg = (k: Int) => BoundedMinK(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true), k)
    forAll(streamGen) { case (vs, k) =>
      val a = agg(k)
      val expected = vs.sorted.take(k)
      val (parts, order) = splits(vs, vs.size.toLong * 31 + k)
      val partials = parts.map { p =>
        val b = a.createAggregationBuffer()
        p.foreach(b.add)
        // every partial takes the shuffle ser/de path, like real
        // map-side partials do
        a.deserialize(a.serialize(b))
      }
      val acc = a.createAggregationBuffer()
      order.foreach(i => acc.addAll(partials(i)))
      assert(acc.sortedAscending.toList == expected)
      // and the unsplit single-buffer run agrees
      val whole = a.createAggregationBuffer()
      vs.foreach(whole.add)
      assert(whole.sortedAscending.toList == expected)
    }
  }

  test("bounded_min_k_distinct: split/merge/serde = distinct.sorted.take(k), exactly") {
    val agg = (k: Int) => BoundedMinKDistinct(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true), k)
    forAll(streamGen) { case (vs, k) =>
      val a = agg(k)
      val expected = vs.distinct.sorted.take(k)
      val (parts, order) = splits(vs, vs.size.toLong * 37 + k)
      val partials = parts.map { p =>
        val b = a.createAggregationBuffer()
        p.foreach(b.add)
        a.deserialize(a.serialize(b))
      }
      val acc = a.createAggregationBuffer()
      order.foreach(i => acc.addAll(partials(i)))
      assert(acc.sortedAscending.toList == expected)
    }
  }

  test("bounded_min_k_pairs: split/merge/serde = pairs.sorted.take(k), exactly") {
    val pairGen: Gen[(List[(Long, Long)], Int)] = for {
      n <- Gen.chooseNum(0, 300)
      ps <- Gen.listOfN(n, for {
        o <- Gen.chooseNum(0L, 50L); t <- Gen.chooseNum(0L, 1000L)
      } yield (o, t))
      k <- Gen.chooseNum(1, 16)
    } yield (ps, k)
    val agg = (k: Int) => BoundedMinKPairs(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        1, org.apache.spark.sql.types.LongType, nullable = true), k)
    forAll(pairGen) { case (ps, k) =>
      val a = agg(k)
      val expected = ps.sorted.take(k)
      val (parts, order) = splits(ps, ps.size.toLong * 41 + k)
      val partials = parts.map { p =>
        val b = a.createAggregationBuffer()
        p.foreach { case (o, t) => b.add(o, t) }
        a.deserialize(a.serialize(b))
      }
      val acc = a.createAggregationBuffer()
      order.foreach(i => acc.addAll(partials(i)))
      assert(acc.sortedAscending.toList == expected)
    }
  }

  test("misra_gries: worst-case guarantees hold on every split, merge order, and serde path") {
    val agg = (k: Int) => MisraGries(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true), k)
    forAll(streamGen) { case (vs, k) =>
      val a = agg(k)
      val exact = vs.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
      val n = vs.size.toLong
      val (parts, order) = splits(vs, vs.size.toLong * 43 + k)
      val partials = parts.map { p =>
        val b = a.createAggregationBuffer()
        p.foreach(b.add)
        a.deserialize(a.serialize(b))
      }
      val acc = a.createAggregationBuffer()
      order.foreach(i => acc.mergeIn(partials(i)))
      val entries = acc.sortedEntries.toList
      assert(entries.size <= k, s"summary larger than k=$k")
      val est = entries.map { case (v, c) => v -> c }.toMap
      // (a) never overestimate
      est.foreach { case (v, c) =>
        assert(c <= exact(v), s"overestimate on $v: $c > ${exact(v)}")
      }
      // (b) residual underestimate bound, computed FROM the summary
      val bound = (n - est.values.sum) / (k + 1)
      exact.foreach { case (v, f) =>
        assert(f - est.getOrElse(v, 0L) <= bound,
          s"bound violated on $v: $f - ${est.getOrElse(v, 0L)} > $bound")
      }
      // (c) every (k+1)-heavy key survives every path
      exact.foreach { case (v, f) =>
        if (f * (k + 1) > n)
          assert(est.contains(v), s"heavy key $v (f=$f, n=$n) dropped")
      }
    }
  }
}
