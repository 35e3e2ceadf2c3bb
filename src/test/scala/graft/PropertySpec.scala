package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sharding}
import graft.ops.tb.TbPipeline

/** Property-based invariants (SURVEY §5e): pivot∘unpivot round-trip,
  * rate-formula guards, jaccard bounds, shard packing. Generators run
  * against in-memory DataFrames on the shared session. (scalacheck
  * drives generation; the scalatest bridge artifact is not in the
  * offline cache, so a small deterministic sampler stands in for
  * forAll.)
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Deterministic mini-forAll: n samples from seeded generator. */
  private def forAll[T](gen: Gen[T], n: Int = 10)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }
  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val word = Gen.oneOf("spark", "join", "scan", "the", "a", "merge", "sort")
  private val textGen = Gen.chooseNum(3, 30)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("melt(unpivot) of a wide frame always yields rows = ids x values and no nulls") {
    forAll(Gen.chooseNum(1, 20)) { n =>
      val wide = (0 until n).map(i => (i.toLong, i * 1.0, i * 2.0))
        .toDF("id", "m_a", "m_b")
      val long = TbPipeline.meltWide(wide, Seq("id"), Seq("m_a", "m_b"))
      assert(long.count() == 2L * n)
      assert(long.filter($"value".isNull).count() == 0)
    }
  }

  test("pivot then unpivot round-trips the long fact table") {
    val long = Seq(
      ("KHM", 2018, "e_inc_num", 10.0), ("KHM", 2018, "e_mort_num", 2.0),
      ("KHM", 2019, "e_inc_num", 12.0), ("KHM", 2019, "e_mort_num", 3.0))
      .toDF("iso3", "year", "indicator", "value")
    val wide = long.groupBy("iso3", "year")
      .pivot("indicator", Seq("e_inc_num", "e_mort_num")).agg(first("value"))
    val back = wide.unpivot(
      Array($"iso3", $"year"),
      Array($"e_inc_num", $"e_mort_num"), "indicator", "value")
    assert(back.collect().map(_.toSeq).toSet == long.collect().map(_.toSeq).toSet)
  }

  test("rate derivation never divides by zero and rates are non-negative") {
    forAll(Gen.zip(Gen.chooseNum(0L, 2000000L), Gen.chooseNum(0.0, 1e6))) { case (pop, cases) =>
      val df = Seq(("X", 2020, cases, 0, cases / 10, 0, pop))
        .toDF("iso3", "year", "total_cases", "new_cases", "deaths", "prevalence", "population")
      val rated = TbPipeline.deriveRates(df).collect()(0)
      val rate = BigDecimal(rated.getAs[java.math.BigDecimal]("total_cases_per_100k"))
      assert(rate >= 0)
      if (pop == 0) assert(rate == 0)
    }
  }

  test("jaccard pairs are always within [0,1] and symmetric-free (d1<d2)") {
    forAll(Gen.listOfN(6, textGen)) { texts =>
      whenever(texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val pairs = Dedup.ngramJaccardPairs(docs, k = 2, threshold = 0.0).collect()
        pairs.foreach { r =>
          val j = r.getAs[Double]("jaccard")
          assert(j >= 0.0 && j <= 1.0)
          assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
        }
      }
    }
  }

  test("identical texts always reach jaccard 1.0 and minhash finds them") {
    forAll(textGen) { t =>
      whenever(t.split(" ").length >= 3) {
        val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
        val exact = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.99).count()
        val lsh = Dedup.minHashPairs(docs, k = 3, threshold = 0.99).count()
        assert(exact == 1 && lsh == 1)
      }
    }
  }

  test("token shards never exceed budget by more than one document") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val budget = 3000L
    val sharded = Sharding.tokenBudgetShards(docs, budget)
    val perShard = sharded.groupBy("source", "shard_id")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("biggest"))
    // a shard can overshoot only by its last (single) document
    assert(perShard.filter($"tok" > $"biggest" + budget).count() == 0)
  }

  test("chunking is lossless: dropping each chunk's overlap reconstructs the doc") {
    val docs = graft.Tables.documents(spark, SparkTestSession.sf)
    val overlap = 8
    val chunks = graft.operators.TextAnalysis
      .chunkDocs(docs, chunkTokens = 32, overlap = overlap)
      .select("doc_id", "chunk_id", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (id, rows) =>
        val ordered = rows.sortBy(_._2).map(_._3.split(" ").toSeq)
        id -> (ordered.head ++ ordered.tail.flatMap(_.drop(overlap))).mkString(" ")
      }
    val originals = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.size == originals.size)
    chunks.foreach { case (id, rebuilt) =>
      assert(rebuilt == originals(id), s"doc $id did not reconstruct")
    }
  }

  test("hash samples nest: a smaller fraction is a subset of a larger one") {
    val docs = graft.Tables.documents(spark, SparkTestSession.sf)
    def ids(frac: Double) = Sharding.hashSample(docs, frac).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val small = ids(0.1)
    val big = ids(0.3)
    // threshold samplers nest by construction — growing a sample never
    // swaps rows out, the property that makes staged data scaling sane
    assert(small.subsetOf(big), s"missing: ${small -- big}")
    assert(small.size < big.size)
  }

  test("hash sample is identical across partition layouts and hits its fraction") {
    val docs = graft.Tables.documents(spark, SparkTestSession.sf)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sharding.hashSample(df, 0.3).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val a = ids(docs.repartition(1))
    val b = ids(docs.repartition(17))
    assert(a == b, "kept set must be a pure function of (id, seed), not layout")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.15, s"fraction off: ${a.size / n}")
    // different seed -> different (but equally stable) sample
    val c = Sharding.hashSample(docs, 0.3, seed = 7L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("hash sample threshold is the ROUNDED nominal fraction (no 1e-6 truncation bias)") {
    // 0.3 * 1e6 is 299999.99999... in binary floating point; a toLong
    // truncation would set the threshold to 299999 and silently exclude
    // rows whose hash bucket is exactly 299999. Find such a row and
    // assert it is kept at fraction 0.3.
    import org.apache.spark.sql.functions._
    val boundary = spark.range(0, 5000000).toDF("doc_id")
      .filter(pmod(xxhash64(col("doc_id"), lit(42L)), lit(1000000L)) === 299999L)
      .limit(1)
    assert(boundary.count() == 1, "need a bucket-299999 id in the probe range")
    assert(Sharding.hashSample(boundary, 0.3).count() == 1,
      "bucket 299999 must fall inside a 0.3 sample (threshold 300000)")
  }

  test("stratified sample respects fractions within tolerance") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val fracs = Map("src0" -> 0.5, "src1" -> 0.1)
    val sampled = Sharding.stratifiedSample(docs, fracs)
    assert(sampled.filter(!$"source".isin("src0", "src1")).count() == 0)
    val n0 = docs.filter($"source" === "src0").count().toDouble
    val s0 = sampled.filter($"source" === "src0").count().toDouble
    assert(math.abs(s0 / n0 - 0.5) < 0.2, s"src0 fraction ${s0 / n0}")
  }

  test("simhash of any doc equals simhash of itself permuted (set semantics)") {
    forAll(textGen) { t =>
      whenever(t.split(" ").length >= 3) {
        val shuffled = scala.util.Random.shuffle(t.split(" ").toList).mkString(" ")
        val df = Seq((1L, t), (2L, shuffled)).toDF("doc_id", "text")
        val hashes = Dedup.withSimHash(df, k = 1)
          .select("simhash").collect().map(_.getLong(0))
        assert(hashes(0) == hashes(1),
          "1-shingles are word sets; permutation must not change simhash")
      }
    }
  }
}
