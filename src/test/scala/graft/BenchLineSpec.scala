package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench metric line is parsed by the driver with a strict JSON
  * loader; a malformed line zeroes the round's bench silently. Lock
  * its well-formedness by round-tripping through Jackson (ships with
  * Spark) under adversarial inputs — quotes, backslashes, control
  * chars, empty sections — and pin the field contract the README
  * documents (queries/failed/flaky/fast_hash/samples/sf).
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("nominal line parses with every documented field") {
    val line = Bench.metricLine(
      results = Seq("q01" -> 1.25, "q02" -> 0.033),
      failed = Seq("q99"), flaky = Seq("q50"),
      fastHash = Seq("q23" -> 0.9),
      samples = Seq("q01" -> Seq(1.25, 2.5), "q02" -> Seq(0.033)),
      sfDir = "/root/testdata/sf0.1")
    val n = mapper.readTree(line)
    assert(n.get("metric").asText == "total")
    assert(math.abs(n.get("value").asDouble - 1.283) < 1e-9)
    assert(n.get("queries").get("q01").asDouble == 1.25)
    assert(n.get("failed").get(0).asText == "q99")
    assert(n.get("flaky").get(0).asText == "q50")
    assert(n.get("fast_hash").get("q23").asDouble == 0.9)
    assert(n.get("samples").get("q01").size == 2)
    assert(n.get("samples").get("q01").get(1).asDouble == 2.5)
    assert(n.get("sf").asText == "/root/testdata/sf0.1")
  }

  test("empty bench still emits valid JSON") {
    val n = mapper.readTree(Bench.metricLine(Nil, Nil, Nil, Nil, Nil, ""))
    assert(n.get("value").asDouble == 0.0)
    assert(n.get("queries").size == 0 && n.get("samples").size == 0)
  }

  test("quotes, backslashes, and control chars escape cleanly") {
    val evil = "sf\"dir\\with\ttab\nnewline"
    val line = Bench.metricLine(
      results = Seq("q\"uote" -> 1.0),
      failed = Seq("back\\slash"), flaky = Nil, fastHash = Nil,
      samples = Seq("q\"uote" -> Seq(1.0)), sfDir = evil)
    val n = mapper.readTree(line)
    assert(n.get("sf").asText == evil)
    assert(n.get("queries").get("q\"uote").asDouble == 1.0)
    assert(n.get("failed").get(0).asText == "back\\slash")
  }

  test("comma-decimal default locale cannot corrupt the number format") {
    val prior = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.FRANCE)
    try {
      val line = Bench.metricLine(
        results = Seq("q01" -> 1.25), failed = Nil, flaky = Nil,
        fastHash = Nil, samples = Seq("q01" -> Seq(1.25)), sfDir = "x")
      val n = mapper.readTree(line)
      assert(n.get("samples").get("q01").get(0).asDouble == 1.25)
    } finally java.util.Locale.setDefault(prior)
  }

  test("no-sample query renders an empty array, not a dangling comma") {
    val line = Bench.metricLine(
      results = Seq("q01" -> 1.0), failed = Nil, flaky = Nil,
      fastHash = Nil, samples = Seq("q01" -> Nil), sfDir = "x")
    val n = mapper.readTree(line)
    assert(n.get("samples").get("q01").size == 0)
  }

  test("regressions key renders and defaults to empty") {
    val withReg = mapper.readTree(Bench.metricLine(
      results = Seq("q01" -> 2.0), failed = Nil, flaky = Nil,
      fastHash = Nil, samples = Seq("q01" -> Seq(2.0)), sfDir = "x",
      regressions = Seq("q01" -> 4.0)))
    assert(withReg.get("regressions").get("q01").asDouble == 4.0)
    val without = mapper.readTree(Bench.metricLine(
      results = Nil, failed = Nil, flaky = Nil, fastHash = Nil,
      samples = Nil, sfDir = "x"))
    assert(without.get("regressions").size == 0)
  }

  test("readBaseline recovers per-query minima from a metric line") {
    val dir = java.nio.file.Files.createTempDirectory("benchline")
    val f = dir.resolve("BENCH_OUT.json")
    val line = Bench.metricLine(
      results = Seq("q01" -> 1.25, "q02" -> 0.033),
      failed = Nil, flaky = Nil, fastHash = Seq("q23" -> 0.9),
      samples = Seq("q01" -> Seq(1.25)), sfDir = "x")
    java.nio.file.Files.writeString(f, line + "\n")
    val base = Bench.readBaseline(f.toString, "x")
    assert(base == Map("q01" -> 1.25, "q02" -> 0.033),
      s"fast_hash/samples must not leak into the baseline: $base")
    // gate arithmetic: >2x AND >0.5s absolute
    assert(Bench.readBaseline(dir.resolve("missing.json").toString, "x").isEmpty)
    // a baseline from a DIFFERENT scale factor must not gate this run
    // (an sf0.1 run vs an sf0.001 baseline flags everything)
    assert(Bench.readBaseline(f.toString, "/root/testdata/sf0.1").isEmpty)
    // a baseline with no sf field (pre-gate format) is also skipped
    val noSf = dir.resolve("nosf.json")
    java.nio.file.Files.writeString(noSf,
      """{"metric":"total","value":1.0,"queries":{"q01":1.0}}""" + "\n")
    assert(Bench.readBaseline(noSf.toString, "x").isEmpty)
    // an sfDir needing JSON escaping must still match its OWN
    // baseline — the capture is compared in escaped space, so a
    // quote/backslash in the path can't silently disable the gate
    val weird = dir.resolve("weird.json")
    val weirdSf = """/tmp/sf "q" \ dir"""
    java.nio.file.Files.writeString(weird, Bench.metricLine(
      results = Seq("q01" -> 1.0), failed = Nil, flaky = Nil,
      fastHash = Nil, samples = Nil, sfDir = weirdSf) + "\n")
    assert(Bench.readBaseline(weird.toString, weirdSf) ==
      Map("q01" -> 1.0))
    // append-mode history: BOTH the sf gate and the queries object
    // must come from the LAST line — reading sf from line N while
    // extracting queries from line 1 would gate stale minima
    val hist = dir.resolve("history.json")
    val older = Bench.metricLine(
      results = Seq("q01" -> 9.0), failed = Nil, flaky = Nil,
      fastHash = Nil, samples = Nil, sfDir = "old-sf")
    java.nio.file.Files.writeString(hist, older + "\n" + line + "\n")
    assert(Bench.readBaseline(hist.toString, "x") ==
      Map("q01" -> 1.25, "q02" -> 0.033),
      "multi-line baseline must read queries from the same (last) line as sf")
    assert(Bench.readBaseline(hist.toString, "old-sf").isEmpty,
      "the superseded first line's sf must not match")
  }
}
