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
  }

  test("functions are deterministic across invocations") {
    GraftSession.registerFunctions(spark)
    val q = "SELECT simhash64(shingle_hashes('alpha beta gamma delta', 2)) AS x"
    val a = spark.sql(q).collect()(0).getLong(0)
    val b = spark.sql(q).collect()(0).getLong(0)
    assert(a == b)
  }
}
