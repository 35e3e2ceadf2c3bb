package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's LAST stdout line from a bounded tail
  * capture (~2 KB). This spec pins the contract without running the
  * bench: valid JSON, every registered query present, failures/flaky
  * surfaced, the canary + production/certificate split present, and
  * the line small enough for the tail buffer even with worst-case
  * timings. */
class BenchContractSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted
  private val mapper = new ObjectMapper()

  private def digitId(n: String): String =
    n.takeWhile(_ != '_').dropWhile(!_.isDigit)

  test("summary line is valid JSON with every registered query, under the tail budget") {
    val best = names.map(_ -> 0.456789).toMap
    val line = Bench.summaryJson(names, best,
      names.map(_ -> true).toMap, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1", canary = 0.321)
    assert(line.length < 1980,
      s"line is ${line.length} B — the driver tail capture truncates at 2000 B " +
        "and its parsed field goes null; shorten ids or precision")
    val json = mapper.readTree(line)
    // per-query keys are the DIGITS of the canonical qNN ids (unique
    // by construction; the fallback test below covers collisions)
    val ids = names.map(digitId).toSet
    assert(ids.size == names.size, "registered qNN ids must be unique")
    assert(json.get("queries").fieldNames().asScala.toSet == ids)
    assert(json.get("value").asDouble() > 0)
    // empty failed/flaky are OMITTED — bytes fund precision instead
    assert(json.get("failed") == null && json.get("flaky") == null)
  }

  test("the current query count lands on the cs rung at the stress distribution") {
    // the r6 regression this pins (one notch stronger since r11): the
    // driver's tail capture is a measured 2000 B (BENCH_r08.json), a
    // HARD ceiling. Recalibrated at 195 queries (r18, when q195 tipped
    // the ms rung): at the stress distribution (cycle mean ~0.66 s,
    // above the real per-query mean — 0.578 s at sf0.1, r17) the line
    // now lands on CENTISECONDS — this pin is the registry-growth
    // tripwire: when it breaks again the count crossed the next rung
    // boundary and this comment gets the next recalibration note.
    val cycle = Array(0.030, 0.082, 0.164, 0.223, 0.309, 0.369,
      0.517, 0.988, 1.622, 2.302)
    val real = names.zipWithIndex
      .map { case (n, i) => n -> cycle(i % cycle.length) }.toMap
    val realLine = Bench.summaryJson(names, real,
      names.map(_ -> true).toMap, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1", canary = 0.308, canarySh = 0.142)
    assert(realLine.length < 1980, s"realistic line is ${realLine.length} B")
    val tree = mapper.readTree(realLine)
    assert(tree.get("qunit").asText() == "cs",
      s"expected cs at ${names.size} queries, got ${tree.get("qunit").asText()}")
    for (n <- Seq(names.find(real(_) < 1).get, names.find(real(_) >= 1).get))
      assert(tree.get("queries").get(digitId(n)).asLong()
        == math.round(real(n) * 100),
        s"$n must round-trip at 10 ms resolution")
    assert(math.abs(tree.get("value").asDouble() - real.values.sum) < 0.5,
      "total must stay 3-decimal seconds")
    assert(tree.get("canary").asLong() == 31L)
    assert(tree.get("csh").asLong() == 14L,
      "the canaries ride the line in the rung's own unit")
    // prod (per-run data) NEVER sheds before resolution: it excludes
    // both tagged classes whatever rung the line landed on
    val prodExpected = names
      .filterNot(Bench.OracleCompositions ++ Bench.IndexBuilds).map(real).sum
    assert(math.abs(tree.get("prod").asDouble() - prodExpected) < 0.01)

    // the comp/idx membership LISTS are code constants, so they are
    // the second shed (after memo, before ms resolution). On a
    // registry small enough for the full rung they must be present
    // and correct in memo's comma-joined-string encoding.
    val subset = (names.filter(Bench.OracleCompositions) ++
      names.filter(Bench.IndexBuilds) ++ names).distinct.take(150)
    val subLine = Bench.summaryJson(subset,
      subset.map(_ -> 0.456789).toMap, subset.map(_ -> true).toMap,
      Map.empty, passes = 2, sfDir = "/root/testdata/sf0.1",
      canary = 0.308, canarySh = 0.142)
    val st2 = mapper.readTree(subLine)
    assert(st2.get("qunit").asText() == "ms")
    assert(st2.get("comp").asText().split(",").toSet ==
      Bench.OracleCompositions.map(digitId),
      "every tagged composition query must appear in comp")
    assert(st2.get("idx").asText().split(",").toSet ==
      Bench.IndexBuilds.map(digitId),
      "every tagged index-build query must appear in idx")

    // all-slow worst case (every query > 100 s): integer ms would
    // blow the budget, so the ladder falls to integer seconds and —
    // since 195 queries × 3-digit values overflow even that (r18,
    // measured 1983 B) — to the top-N shed: per-query entries for the
    // slowest K, the dropped count visible in `shed`, headline
    // total/prod still over every query. The line can never arrive
    // beheaded: keep=0 always fits.
    val slow = names.map(_ -> 123.456789).toMap
    val slowLine = Bench.summaryJson(names, slow,
      names.map(_ -> true).toMap, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1")
    val st = mapper.readTree(slowLine)
    assert(slowLine.length < 1980)
    assert(st.get("qunit").asText() == "s")
    val shed = Option(st.get("shed")).map(_.asInt()).getOrElse(0)
    assert(st.get("queries").size() + shed == names.size,
      "every query is either listed or counted in shed")
    assert(shed > 0, s"at ${names.size} all-slow queries the shed tier must fire")
    val anyKept = st.get("queries").fieldNames().asScala.next()
    assert(st.get("queries").get(anyKept).asLong() == 123L)
    assert(math.abs(st.get("value").asDouble() - slow.values.sum) < 0.5,
      "the headline total covers shed queries too")
  }

  test("past the ms budget the ladder lands on CENTISECONDS, not integer seconds") {
    // a synthetic 210-query registry at the pre-r17 stress
    // distribution (mean ~0.94 s): integer ms overflows the tail
    // budget (measured ~2.1 kB), centiseconds fit (~1.94 kB), and the
    // r17 rung must catch it at 10 ms resolution — the old direct
    // fall to integer seconds zeroed every sub-second query, costing
    // the whole round-over-round comparison (220+ queries at this
    // distribution overflow cs too and legitimately land on seconds)
    val big = (1 to 210).map(i => s"q${i}_synth")
    val cycle = Array(0.043, 0.117, 0.234, 0.318, 0.441, 0.527,
      0.738, 1.412, 2.317, 3.289)
    val real = big.zipWithIndex
      .map { case (n, i) => n -> cycle(i % cycle.length) }.toMap
    val line = Bench.summaryJson(big, real, big.map(_ -> true).toMap,
      Map.empty, passes = 2, sfDir = "/root/testdata/sf0.1",
      canary = 0.308, canarySh = 0.142)
    assert(line.length < 1980, s"cs line is ${line.length} B")
    val t = mapper.readTree(line)
    assert(t.get("qunit").asText() == "cs",
      s"expected the centisecond rung, got ${t.get("qunit").asText()}")
    for (n <- Seq(big.find(real(_) < 1).get, big.find(real(_) >= 1).get))
      assert(t.get("queries").get(digitId(n)).asLong()
        == math.round(real(n) * 100),
        s"$n must round-trip at 10 ms resolution")
    assert(math.abs(t.get("value").asDouble() - real.values.sum) < 0.5,
      "the headline total stays 3-decimal seconds on every rung")
  }

  test("past the cs budget the ladder lands on DECISECONDS, not integer seconds") {
    // a synthetic 230-query registry at the same stress distribution:
    // the r17 spec measured 220+ queries overflowing the centisecond
    // rung, and the registry sits one growth-round away — the r18 ds
    // rung must catch the 220–240 band at 100 ms resolution instead
    // of zeroing every sub-second query to "s"
    val big = (1 to 230).map(i => s"q${i}_synth")
    val cycle = Array(0.043, 0.117, 0.234, 0.318, 0.441, 0.527,
      0.738, 1.412, 2.317, 3.289)
    val real = big.zipWithIndex
      .map { case (n, i) => n -> cycle(i % cycle.length) }.toMap
    val line = Bench.summaryJson(big, real, big.map(_ -> true).toMap,
      Map.empty, passes = 2, sfDir = "/root/testdata/sf0.1",
      canary = 0.308, canarySh = 0.142)
    assert(line.length < 1980, s"ds line is ${line.length} B")
    val t = mapper.readTree(line)
    assert(t.get("qunit").asText() == "ds",
      s"expected the decisecond rung, got ${t.get("qunit").asText()}")
    for (n <- Seq(big.find(real(_) >= 1).get, big.find(real(_) >= 3).get))
      assert(t.get("queries").get(digitId(n)).asLong()
        == math.round(real(n) * 10),
        s"$n must round-trip at 100 ms resolution")
    assert(math.abs(t.get("value").asDouble() - real.values.sum) < 0.5,
      "the headline total stays 3-decimal seconds on every rung")
    assert(t.get("queries").size() == big.size)
  }

  test("memo-tagged queries appear as digit ids; the field is omitted when empty") {
    // a SMALL synthetic registry: the memo FORMAT contract must stay
    // testable whatever the real registry's size — at 189 queries the
    // memo-bearing rung legitimately exceeds the tail budget and the
    // ladder sheds it first (by design; the full line with memo
    // always lands on stderr / BENCH_LOCAL), so the real-registry
    // assertion below is only that shedding happened cleanly
    val small = (1 to 10).map(i => f"q$i%02d_synth").toSeq
    val sBest = small.map(_ -> 0.4).toMap
    val sOk = small.map(_ -> true).toMap
    val tagged = Set(small.head, small.last)
    val line = Bench.summaryJson(small, sBest, sOk, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1", canary = 0.2, memoTagged = tagged)
    val json = mapper.readTree(line)
    assert(json.get("memo").asText().split(",").toSet == tagged.map(digitId))
    // a stale tag for an unregistered query must not leak into the line
    val line2 = Bench.summaryJson(small, sBest, sOk, Map.empty, passes = 2,
      sfDir = "x", memoTagged = Set("q999_gone"))
    assert(mapper.readTree(line2).get("memo") == null)
    // real registry: the line always fits, with or without memo tags
    // surviving the ladder; forceFull always carries them
    val best = names.map(_ -> 0.4).toMap
    val ok = names.map(_ -> true).toMap
    val real = Bench.summaryJson(names, best, ok, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1", canary = 0.2,
      memoTagged = Set(names.head))
    assert(real.length < 1980, s"laddered line is ${real.length} B")
    val full = Bench.summaryJson(names, best, ok, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1", canary = 0.2,
      memoTagged = Set(names.head), forceFull = true)
    assert(mapper.readTree(full).get("memo").asText() == digitId(names.head))
  }

  test("the ladder sheds the memo field before it sheds ms resolution") {
    // every query memo-tagged: the memo array alone (~6 B × queries)
    // blows the tail budget, so the middle rung must emit integer-ms
    // WITHOUT the memo field rather than falling to a coarser unit.
    // Pinned on a 150-name subset of the real registry (r18: the FULL
    // registry crossed the ms boundary even without memo, so the
    // memo-vs-resolution order is only observable below it — the
    // cs-rung test above owns the full-registry pin).
    val subset = names.take(150)
    val cycle = Array(0.030, 0.082, 0.164, 0.223, 0.309, 0.369,
      0.517, 0.988, 1.622, 2.302)
    val real = subset.zipWithIndex
      .map { case (n, i) => n -> cycle(i % cycle.length) }.toMap
    val line = Bench.summaryJson(subset, real,
      subset.map(_ -> true).toMap, Map.empty, passes = 2,
      sfDir = "/root/testdata/sf0.1", canary = 0.3,
      memoTagged = subset.toSet)
    assert(line.length < 1980)
    val t = mapper.readTree(line)
    assert(t.get("qunit").asText() == "ms")
    assert(t.get("memo") == null)
  }

  test("merged-stream tail: the ladder line survives as the LAST line when the full line prints first") {
    // The driver's 2000 B tail capture MERGES stderr into stdout
    // (proven r16: BENCH_r16.json parsed:null — the [bench-full]
    // stderr line printed AFTER the stdout ladder line pushed the
    // parseable line out of the window and arrived beheaded). The fix
    // is emission ORDER: full line first, ladder line last. This
    // simulates the merged stream at the REAL registry size with the
    // worst realistic payload (memo tags on every query, forceFull
    // carries them all) and asserts the tail's last line is the
    // parseable ladder line.
    val cycle = Array(0.030, 0.082, 0.164, 0.223, 0.309, 0.369,
      0.517, 0.988, 1.622, 2.302)
    val real = names.zipWithIndex
      .map { case (n, i) => n -> cycle(i % cycle.length) }.toMap
    val ok = names.map(_ -> true).toMap
    val full = "[bench-full] " + Bench.summaryJson(names, real, ok,
      Map.empty, passes = 3, sfDir = "/root/testdata/sf0.1",
      canary = 0.308, memoTagged = names.toSet, canarySh = 0.142,
      forceFull = true)
    val ladder = Bench.summaryJson(names, real, ok, Map.empty,
      passes = 3, sfDir = "/root/testdata/sf0.1", canary = 0.308,
      memoTagged = names.toSet, canarySh = 0.142)
    // emission order as in Bench.main: full (stderr) BEFORE ladder
    // (stdout); the merged stream interleaves whole lines here because
    // both ends are line-buffered println calls
    val merged = full + "\n" + ladder + "\n"
    val tail = merged.takeRight(2000)
    val lastLine = tail.split("\n").last
    assert(lastLine == ladder,
      "the last line of the merged 2000 B tail must be the ladder line")
    val json = mapper.readTree(lastLine)
    assert(json.get("value").asDouble() > 0)
    assert(json.get("queries").size() == names.size)
  }

  test("failures and flaky passes appear in their own fields (full names when ids collide)") {
    val ns = Seq("q1_ok", "q1_dead", "q1_flaky") // colliding digit ids
    val line = Bench.summaryJson(ns,
      Map("q1_ok" -> 1.0, "q1_dead" -> 0.5, "q1_flaky" -> 2.0),
      Map("q1_ok" -> true, "q1_dead" -> false, "q1_flaky" -> true),
      Map("q1_dead" -> 2, "q1_flaky" -> 1), passes = 2, sfDir = "x")
    val json = mapper.readTree(line)
    assert(json.get("failed").elements().asScala.map(_.asText()).toSeq == Seq("q1_dead"))
    assert(json.get("flaky").get("q1_flaky").asInt() == 1)
    assert(json.get("flaky").size() == 1)
    assert(json.get("queries").fieldNames().asScala.toSet == ns.toSet)
  }
}
