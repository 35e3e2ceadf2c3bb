package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's LAST stdout line from a bounded tail
  * capture (~2 KB). This spec pins the contract without running the
  * bench: valid JSON, every registered query present, failures/flaky
  * surfaced, and the line small enough for the tail buffer even with
  * worst-case timings. */
class BenchContractSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted
  private val mapper = new ObjectMapper()

  test("summary line is valid JSON with every registered query, under the tail budget") {
    val best = names.map(_ -> 123.456789).toMap
    val line = Bench.summaryJson(names, best,
      names.map(_ -> true).toMap, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length < 2000,
      s"line is ${line.length} B — the driver tail capture truncates at 2000 B " +
        "and its parsed field goes null; shorten names or precision")
    val json = mapper.readTree(line)
    // per-query keys are the canonical qNN ids (unique by construction
    // in the registry; the fallback test below covers collisions)
    val shortIds = names.map(_.takeWhile(_ != '_')).toSet
    assert(shortIds.size == names.size, "registered qNN ids must be unique")
    assert(json.get("queries").fieldNames().asScala.toSet == shortIds)
    assert(json.get("value").asDouble() > 0)
    assert(json.get("failed").isEmpty && json.get("flaky").isEmpty)
  }

  test("per-query timings keep millisecond precision at the current query count") {
    // the r6 regression this pins: 86 full-name keys forced the
    // precision clamp to whole seconds. With qNN ids, three decimals
    // must survive at REALISTIC per-query timings (sub-10 s — every
    // recorded round's per-query minima are far below that); an
    // all-slow worst case (every query > 100 s, +3 chars per value)
    // legitimately self-clamps — one step at 132 queries, two at 139
    // — and 0.1 s resolution on a >100 s timing is still noise-floor-
    // irrelevant — so that case pins ≥ 1 decimal, never whole
    // seconds.
    val real = names.map(_ -> 9.123456).toMap
    val realLine = Bench.summaryJson(names, real,
      names.map(_ -> true).toMap, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1")
    val rv = mapper.readTree(realLine).get("queries")
      .get(names.head.takeWhile(_ != '_')).asDouble()
    assert(math.abs(rv - 9.123) < 1e-9, s"expected 3-decimal timing, got $rv")
    val slow = names.map(_ -> 123.456789).toMap
    val slowLine = Bench.summaryJson(names, slow,
      names.map(_ -> true).toMap, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1")
    val sv = mapper.readTree(slowLine).get("queries")
      .get(names.head.takeWhile(_ != '_')).asDouble()
    assert(math.abs(sv - 123.456789) < 0.05 + 1e-9,
      s"worst-case must keep at least 1 decimal, got $sv")
  }

  test("failures and flaky passes appear in their own fields (full names when ids collide)") {
    val ns = Seq("q_ok", "q_dead", "q_flaky") // all share prefix "q"
    val line = Bench.summaryJson(ns,
      Map("q_ok" -> 1.0, "q_dead" -> 0.5, "q_flaky" -> 2.0),
      Map("q_ok" -> true, "q_dead" -> false, "q_flaky" -> true),
      Map("q_dead" -> 2, "q_flaky" -> 1), passes = 2, sfDir = "x")
    val json = mapper.readTree(line)
    assert(json.get("failed").elements().asScala.map(_.asText()).toSeq == Seq("q_dead"))
    assert(json.get("flaky").get("q_flaky").asInt() == 1)
    assert(json.get("flaky").size() == 1)
    assert(json.get("queries").fieldNames().asScala.toSet == ns.toSet)
  }
}
