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

  test("repJson emits a strict-JSON object with all eleven counters") {
    val node = mapper.readTree(
      Bench.repJson(Bench.Rep(1.187529307, 0.046, 3.125e-4, 0.0021875, 8.82,
        0.37, readBytes = 1048576L, majflt = 3L, jit = 0.125,
        codegenN = 2L, mhz = 3201.5)))
    assert(node.get("wall").asDouble() === 1.187529307)
    assert(node.get("gc").asDouble() === 0.046)
    assert(node.get("steal").asDouble() === 3.125e-4)
    assert(node.get("iowait").asDouble() === 0.0021875)
    assert(node.get("cpu").asDouble() === 8.82)
    assert(node.get("other_cpu").asDouble() === 0.37)
    assert(node.get("read_bytes").asLong() === 1048576L)
    assert(node.get("majflt").asLong() === 3L)
    assert(node.get("jit").asDouble() === 0.125)
    assert(node.get("codegen_n").asLong() === 2L)
    assert(node.get("mhz").asDouble() === 3201.5)
  }

  test("forensic counter readers return plausible values on this host") {
    assume(new java.io.File("/proc/self/io").canRead)
    val (rb, mf) = Bench.procIo()
    assert(rb >= 0L, s"read_bytes $rb")
    assert(mf >= 0L, s"majflt $mf")
    // jit is monotonic and this JVM has compiled SOMETHING by now
    assert(Bench.jitMillis() > 0L)
    // mhz: either unavailable (-1) or a sane clock
    val mhz = Bench.cpuMhz()
    assert(mhz == -1.0 || (mhz > 100 && mhz < 10000), s"mhz $mhz")
    // codegen counter is readable (may be 0 if no SQL ran yet in this JVM)
    assert(Bench.codegenCount() >= 0L)
  }

  test("repsJson over many queries/reps parses and preserves structure") {
    val reps = Seq(
      "q\"weird\nname" -> Seq(Bench.Rep(0.1, 0, 0, 0, 0.2, 0), Bench.Rep(0.3, 0.01, 1e-4, 0, 0.4, 0)),
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
    val Some((steal, iowait, n, busy)) = Bench.hostCounters(): @unchecked
    assert(steal >= 0L && iowait >= 0L && busy >= 0L)
    assert(n >= 1 && n <= 4096)
  }

  test("headline for the CURRENT registry parses and fits the consumer's tail window") {
    // Worst-ish realistic values: every query at a 3-digit-integer second
    // count. The consumer tails ~2000 chars and sbt's epilogue (~70 chars)
    // follows the line, so the chosen line must stay ≤ 1930 — at 79 queries
    // the pre-degradation 1-decimal form measured 1959 and would have cost
    // the round its bench.
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 123.456789)
    val line = Bench.chooseHeadline(results, Seq.empty, 0, 0, 3,
      "/root/testdata/sf0.1", detailWriteFailed = false)
    assert(line.length <= 1930,
      s"headline ${line.length} chars exceeds the ~1930 tail-window budget")
    val node = mapper.readTree(line)
    // either the full map fits, or the cut is explicitly disclosed AND
    // accounted: omitted_sum + omit_rule make the truncation rule-complete
    // (total ≈ Σ kept queries + omitted_sum balances from the line alone).
    val omitted = Option(node.get("queries_omitted")).map(_.asInt()).getOrElse(0)
    assert(node.get("queries").size() + omitted === SparkEntry.queries.size)
    if (omitted > 0) {
      assert(node.get("omit_rule").asText().startsWith("slowest_"))
      import scala.jdk.CollectionConverters._
      val keptSum = node.get("queries").elements().asScala.map(_.asDouble()).sum
      val accounted = keptSum + node.get("omitted_sum").asDouble()
      val total = node.get("value").asDouble()
      // dp=0 rounding on each kept query bounds the drift at 0.5s/query
      assert(math.abs(accounted - total) <= 0.5 * (node.get("queries").size() + 1),
        s"headline accounting broken: kept+omitted=$accounted vs total=$total")
    }
    // zero-valued counters are omitted (omitted ≡ 0, presence means nonzero)
    assert(node.get("n_guard_vetoed") == null && node.get("n_stalls") == null)
    assert(node.get("sf").asText() === "sf0.1")
    // nonzero counters must appear
    val busy = mapper.readTree(Bench.chooseHeadline(results, Seq.empty, 2, 1, 3,
      "/root/testdata/sf0.1", detailWriteFailed = false))
    assert(busy.get("n_stalls").asInt() === 2)
    assert(busy.get("n_guard_vetoed").asInt() === 1)
    // realistic values (sub-10s queries) must keep the FULL per-query map
    // while it can possibly fit: the 87-query dp=0 map measures ~1915 of
    // the 1925 stretch budget. If the registry outgrows ~88 current-shape
    // names the full map physically exceeds the tail window — truncation
    // then becomes legal but must stay disclosed (accounting assert).
    val realistic = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.234567)
    val rline = Bench.chooseHeadline(realistic, Seq.empty, 0, 0, 3,
      "/root/testdata/sf0.1", detailWriteFailed = false)
    assert(rline.length <= 1930)
    val rnode = mapper.readTree(rline)
    val romitted = Option(rnode.get("queries_omitted")).map(_.asInt()).getOrElse(0)
    assert(rnode.get("queries").size() + romitted === SparkEntry.queries.size)
    if (SparkEntry.queries.size <= 88)
      assert(romitted === 0,
        "realistic-magnitude run must not truncate the per-query map")
  }

  test("oracleParityOnly: every tag names a registered query with a registered at-scale twin; headline carries value_at_scale") {
    val tags = SparkEntry.oracleParityOnly
    assert(tags.subsetOf(SparkEntry.queries.keySet),
      s"dangling tags: ${tags -- SparkEntry.queries.keySet}")
    // each twin the tag comments promise is actually registered
    Seq("dedup_simhash_xxhash", "dedup_simhash128_pairs",
      "dedup_minhash_xxhash", "stream_docs_neardup_banded")
      .foreach(t => assert(SparkEntry.queries.contains(t), s"missing twin $t"))
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 2.0)
    val line = Bench.chooseHeadline(results, Seq.empty, 0, 0, 3,
      "/root/testdata/sf0.1", detailWriteFailed = false, parityOnly = tags)
    val node = mapper.readTree(line)
    assert(node.get("value_at_scale") != null, s"no value_at_scale in: $line")
    assert(math.abs(node.get("value").asDouble() - node.get("value_at_scale").asDouble()
      - 2.0 * tags.size) < 0.01)
    assert(line.length <= 1930)
    // with no tagged query in the run (e.g. SPARK_GRAFT_SKIP_PARITY_ONLY=1
    // or a filtered subset), the field is omitted — total IS at-scale
    val skipped = results.filterNot(r => tags(r._1))
    val sline = Bench.chooseHeadline(skipped, Seq.empty, 0, 0, 3,
      "/root/testdata/sf0.1", detailWriteFailed = false, parityOnly = tags)
    assert(mapper.readTree(sline).get("value_at_scale") == null)
  }

  test("regression gate: >2x with clean counters flags; host-explained and sub-floor do not") {
    val prev = Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.1, "d" -> 1.0)
    def rep(wall: Double, gc: Double = 0.0, steal: Double = 0.0) =
      Bench.Rep(wall, gc, steal, 0.0, wall, 0.0)
    val reps = Map(
      "a" -> Seq(rep(3.0), rep(3.1), rep(2.9)),            // clean 3x — flag
      "b" -> Seq(rep(3.0, gc = 1.5), rep(3.1, gc = 1.4), rep(2.9, gc = 1.6)), // GC-explained
      "c" -> Seq(rep(0.3), rep(0.3), rep(0.3)),            // 3x but sub-floor
      "d" -> Seq(rep(1.1), rep(1.1), rep(1.1)),            // within 2x
      "e" -> Seq(rep(9.0), rep(9.0), rep(9.0)))            // no prev — no gate
    val now = Seq("a" -> 3.0, "b" -> 3.0, "c" -> 0.3, "d" -> 1.1, "e" -> 9.0)
    val flagged = Bench.computeRegressions(prev, now, reps)
    assert(flagged.map(_._1) === Seq("a"))
    assert(flagged.head._2 === 1.0 && flagged.head._3 === 3.0)
    // >2x and above floor but under the 1 s absolute excess: the small-
    // query cross-window jitter class (0.58 -> 1.39 on a clean run) must
    // NOT flag — only moves that are big in ratio AND in seconds do
    assert(Bench.computeRegressions(Map("j" -> 0.55), Seq("j" -> 1.39),
      Map("j" -> Seq(rep(1.39), rep(1.4), rep(1.38)))).isEmpty)
    // steal-explained slowness is the host's, not the code's
    val stealReps = Map("a" -> Seq(rep(3.0, steal = 0.9), rep(3.0, steal = 0.9), rep(3.0, steal = 0.9)))
    assert(Bench.computeRegressions(Map("a" -> 1.0), Seq("a" -> 3.0), stealReps).isEmpty)
    // a failed query (-1) never counts as a regression
    assert(Bench.computeRegressions(Map("a" -> 1.0), Seq("a" -> -1.0), Map.empty).isEmpty)
  }

  test("regression gate: readPrevQueries keys on matching sf and degrades to empty") {
    val dir = java.nio.file.Files.createTempDirectory("benchprev")
    val f = dir.resolve("prev.json").toFile
    val w = new java.io.PrintWriter(f)
    w.write("""{"queries":{"a":1.5,"b":-1},"sf":"/data/sf0.1"}"""); w.close()
    assert(Bench.readPrevQueries(f.getPath, "/data/sf0.1") === Map("a" -> 1.5))
    // mismatched sf (subset/alternate-scale file) must never gate
    assert(Bench.readPrevQueries(f.getPath, "/data/sf1") === Map.empty)
    // missing/corrupt file degrades to no evidence, not an exception
    assert(Bench.readPrevQueries(dir.resolve("nope.json").toString, "/data/sf0.1") === Map.empty)
    val g = dir.resolve("bad.json").toFile
    val w2 = new java.io.PrintWriter(g); w2.write("{not json"); w2.close()
    assert(Bench.readPrevQueries(g.getPath, "/data/sf0.1") === Map.empty)
  }

  test("headline carries n_regressions only when nonzero") {
    val results = Seq("a" -> 1.0, "b" -> 2.0)
    val clean = mapper.readTree(Bench.chooseHeadline(results, Seq.empty, 0, 0, 3,
      "/root/testdata/sf0.1", detailWriteFailed = false))
    assert(clean.get("n_regressions") == null)
    val dirty = mapper.readTree(Bench.chooseHeadline(results, Seq.empty, 0, 0, 3,
      "/root/testdata/sf0.1", detailWriteFailed = false, nRegressions = 2))
    assert(dirty.get("n_regressions").asInt() === 2)
  }

  test("committed BENCH_SELF.json, when present, carries the regressions field") {
    val f = new java.io.File("BENCH_SELF.json")
    assume(f.isFile)
    val node = mapper.readTree(f)
    // present even when empty — the empty object IS the clean-run evidence
    assume(node.get("regressions") != null,
      "pre-gate BENCH_SELF.json (first post-gate run rewrites it)")
    assert(node.get("regressions").isObject)
    assert(node.get("n_regressions") != null)
  }

  test("budget/abort disclosure fields ride the headline and stay within the tail window") {
    // worst case: full current registry AND every deviation counter present
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 123.456789)
    val state = new Bench.RunState(reps = 3, sfDir = "/root/testdata/sf0.1",
      parityOnly = Set.empty, skipParity = false, hostAvailable = true,
      budgetS = 600.0)
    state.synchronized {
      state.nTotal = results.size
      results.foreach { case (k, v) => state.results(k) = v }
      state.nColdSingle = 91; state.nBudgetCut = 20; state.nStreamCapped = 15
      state.sweepSkipped = true
      state.budgetExceeded = true
      state.abortedAt = Some("dedup_exact_rows")
    }
    val line = state.headline(aborted = true)
    assert(line.length <= 1930,
      s"worst-case disclosure headline ${line.length} chars exceeds the tail window")
    val node = mapper.readTree(line)
    assert(node.get("aborted").asBoolean())
    assert(node.get("aborted_at").asText() === "dedup_exact_rows")
    assert(node.get("reps_reduced").asInt() === 126)
    assert(node.get("n_cold_single").asInt() === 91)
    assert(node.get("sweep_skipped").asBoolean())
    assert(node.get("budget_exceeded").asBoolean())
    // clean run: zero-valued disclosures are omitted entirely
    val clean = mapper.readTree(Bench.chooseHeadline(results, Seq.empty, 0, 0, 3,
      "/root/testdata/sf0.1", detailWriteFailed = false))
    Seq("aborted", "reps_reduced", "sweep_skipped", "n_cold_single",
      "budget_exceeded").foreach(f => assert(clean.get(f) == null, f))
  }

  test("RunState.detailJson is strict JSON carrying the full budget evidence") {
    val state = new Bench.RunState(reps = 3, sfDir = "/data/sf0.1",
      parityOnly = Set("q_parity"), skipParity = false, hostAvailable = true,
      budgetS = 420.0)
    state.synchronized {
      state.nTotal = 3
      state.results("q_parity") = 2.0
      state.results("q_real") = 1.5
      state.repDetail("q_real") = Seq(Bench.Rep(1.5, 0.01, 0, 0, 1.6, 0))
      state.errors("q_bad") = "boom: \"quoted\""
      state.nColdSingle = 1
      state.regressions = Seq(("q_real", 0.5, 1.5))
    }
    val node = mapper.readTree(state.detailJson(partial = true))
    assert(node.get("partial").asBoolean())
    assert(node.get("budget_s").asDouble() === 420.0)
    assert(node.get("n_cold_single").asInt() === 1)
    assert(node.get("n_done").asInt() === 2 && node.get("n_total").asInt() === 3)
    assert(node.get("aborted_at").isNull && node.get("abort_exception").isNull)
    // at-scale total excludes the parity twin
    assert(node.get("value").asDouble() === 3.5)
    assert(node.get("value_at_scale").asDouble() === 1.5)
    assert(node.get("regressions").get("q_real").get("prev").asDouble() === 0.5)
    assert(node.get("errors").get("q_bad").asText() === "boom: \"quoted\"")
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
