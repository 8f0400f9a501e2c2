package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench evidence serialization: round 5 shipped BENCH_SELF.json
  * with Scala `Rep(...)` toString literals in `rep_times`, making the whole
  * detail file unparseable — the machine-readable per-rep evidence the
  * stall-guard design depends on was silently defeated. These tests parse
  * the emitted JSON with Jackson (strict), not string matching. */
class BenchJsonSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("repJson emits a strict-JSON object with all five counters") {
    val node = mapper.readTree(
      Bench.repJson(Bench.Rep(1.187529307, 0.046, 3.125e-4, 0.0021875, 8.82)))
    assert(node.get("wall").asDouble() === 1.187529307)
    assert(node.get("gc").asDouble() === 0.046)
    assert(node.get("steal").asDouble() === 3.125e-4)
    assert(node.get("iowait").asDouble() === 0.0021875)
    assert(node.get("cpu").asDouble() === 8.82)
  }

  test("repsJson over many queries/reps parses and preserves structure") {
    val reps = Seq(
      "q\"weird\nname" -> Seq(Bench.Rep(0.1, 0, 0, 0, 0.2), Bench.Rep(0.3, 0.01, 1e-4, 0, 0.4)),
      "empty_query" -> Seq.empty[Bench.Rep])
    val node = mapper.readTree(Bench.repsJson(reps))
    assert(node.get("q\"weird\nname").size() === 2)
    assert(node.get("q\"weird\nname").get(1).get("wall").asDouble() === 0.3)
    assert(node.get("empty_query").size() === 0)
  }

  test("jd maps non-finite doubles to null (JSON has no NaN/Infinity)") {
    val arr = mapper.readTree(
      s"[${Bench.jd(Double.NaN)},${Bench.jd(Double.PositiveInfinity)},${Bench.jd(1.5)}]")
    assert(arr.get(0).isNull && arr.get(1).isNull)
    assert(arr.get(2).asDouble() === 1.5)
  }

  test("hostCounters reads /proc/stat on Linux with a plausible CPU count") {
    assume(new java.io.File("/proc/stat").canRead)
    val Some((steal, iowait, n)) = Bench.hostCounters(): @unchecked
    assert(steal >= 0L && iowait >= 0L)
    assert(n >= 1 && n <= 4096)
  }

  test("committed BENCH_SELF.json, when present, is valid JSON end-to-end") {
    val f = new java.io.File("BENCH_SELF.json")
    assume(f.isFile)
    val node = mapper.readTree(f)
    assert(node.get("rep_times") != null, "detail must carry per-rep evidence")
    assert(node.get("guard_vetoed") != null, "vetoed guards must be disclosed")
    assert(node.get("host_counters_available") != null)
    val it = node.get("rep_times").elements()
    while (it.hasNext) {
      val reps = it.next()
      val rit = reps.elements()
      while (rit.hasNext) {
        val r = rit.next()
        assert(r.isObject && r.has("wall") && r.has("steal") && r.has("iowait"),
          s"rep must be a counter object, got: $r")
      }
    }
  }
}
