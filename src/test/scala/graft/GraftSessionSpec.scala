package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("registerFunctions makes the native functions SQL-callable") {
    GraftSession.registerFunctions(spark)
    val r = spark.sql(
      """SELECT simhash64(shingle_hashes('the quick brown fox jumps', 3)) AS sh,
        |       minhash_sigs(shingle_hashes('the quick brown fox jumps', 3), 4) AS mh
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) != 0L)
    assert(r.getSeq[Long](1).length == 4)
    // the late-r9 additions resolve from SQL too (aggregate + scalar)
    val r2 = spark.sql(
      """SELECT misra_gries(v, 4) AS mg, max(deflate_len(t)) AS d
        |FROM VALUES (1L, 'aaaa'), (1L, 'aaaa'), (2L, 'bbbb') AS x(v, t)
        |""".stripMargin).collect()(0)
    assert(r2.getSeq[org.apache.spark.sql.Row](0).nonEmpty)
    assert(r2.getLong(1) > 0L)
  }

  test("GraftExtensions injects the ENTIRE catalog through the extensions hook") {
    // drive the same path BaseSessionStateBuilder runs at session
    // construction (spark.sql.extensions=graft.GraftExtensions):
    // apply the extension, materialize its injections into the live
    // registry, and resolve every function from SQL
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    // registerFunctions is private[sql] in Scala but public in
    // bytecode (it IS the hook the session builder invokes) — reflect
    // to drive it against the live registry
    classOf[org.apache.spark.sql.SparkSessionExtensions]
      .getMethod("registerFunctions",
        classOf[org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
      .invoke(ext, spark.sessionState.functionRegistry)
    val r = spark.sql(
      """SELECT
        |  simhash64(shingle_hashes('one two three four', 2)) AS sh,
        |  size(minhash_sigs(shingle_hashes('one two three four', 2), 8)) AS mh,
        |  size(srp_buckets(array(1.0D, 0.0D, -1.0D), 4, 8, 42)) AS srp,
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) != 0L && r.getInt(1) == 8 && r.getInt(2) == 4)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    // the aggregate injects too (builder wraps it in AggregateExpression)
    val agg = spark.sql(
      "SELECT bounded_min_k(v, 2) FROM VALUES (5L), (1L), (3L) AS t(v)")
      .collect()(0).getSeq[Long](0)
    assert(agg == Seq(1L, 3L), s"got $agg")
    // validated builders surface real errors, not IndexOutOfBounds
    val e = intercept[Exception](spark.sql("SELECT shingle_hashes('x')").collect())
    assert(e.getMessage.contains("shingle_hashes"), s"got: ${e.getMessage}")
  }

  test("both routes resolve every FunctionCatalog name (no route drift)") {
    // the round-9 drift class: a function registered programmatically
    // but absent from the spark.sql.extensions route. Both routes now
    // iterate FunctionCatalog.all, and this asserts it stays that way.
    val names = graft.functions.FunctionCatalog.all.map(_.name)
    assert(names.size == names.distinct.size, "duplicate catalog names")
    // extensions route: a fresh SparkSessionExtensions sees every name
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    classOf[org.apache.spark.sql.SparkSessionExtensions]
      .getMethod("registerFunctions",
        classOf[org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
      .invoke(ext, reg)
    names.foreach { n =>
      assert(reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"extensions route missing $n")
    }
    // programmatic route: registerFunctions makes every name resolvable
    GraftSession.registerFunctions(spark)
    names.foreach { n =>
      assert(spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"programmatic route missing $n")
    }
  }

  test("every companion register delegates to its OWN catalog row (class cross-check)") {
    // the round-10 advice hole: register was string-keyed, so a
    // copy-pasted wrong-but-valid name in a companion would silently
    // register a different function. Each delegation now carries the
    // companion's Expression class and the catalog row cross-checks
    // it — this exercises all 21 delegations (a mismatch throws), and
    // pins the failure mode explicitly.
    import graft.functions._
    Seq[org.apache.spark.sql.SparkSession => Unit](
      SimHash64.register, MinHashSigs.register, ShingleHashes.register,
      SrpBuckets.register, CosineSim.register, BoundedMinK.register,
      BoundedMinKDistinct.register, BoundedMinKPairs.register,
      MisraGries.register, DeflateLen.register, MediaType.register,
      AHash64.register, DHash64.register, ImageMeta.register,
      AHash64Gray.register, DHash64Gray.register, EHash64.register,
      EHash64Energy.register, AudioMeta.register, GzipMembers.register,
      GzipMemberEnc.register
    ).foreach(_(spark))
    val wrong = intercept[IllegalArgumentException] {
      FunctionCatalog.register(spark, "ahash64", classOf[DHash64])
    }
    assert(wrong.getMessage.contains("DHash64") &&
      wrong.getMessage.contains("ahash64"))
  }

  test("functions are deterministic across invocations") {
    GraftSession.registerFunctions(spark)
    val q = "SELECT simhash64(shingle_hashes('alpha beta gamma delta', 2)) AS x"
    val a = spark.sql(q).collect()(0).getLong(0)
    val b = spark.sql(q).collect()(0).getLong(0)
    assert(a == b)
  }
}
