package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextOps}

/** Curation-operator guarantees: decontamination counts exactly the
  * benchmark-overlapping grams, the quality gate's exact quantile threshold
  * agrees with an in-memory reference (and the at-scale approx swap stays
  * within tolerance), and sequence packing is a deterministic contiguous
  * layout independent of input partitioning. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("contaminationReport: exact-copy doc is fully contaminated, disjoint doc not at all") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta"), // benchmark
      (1L, "alpha beta gamma delta epsilon zeta eta"), // exact copy → bp 10000
      (2L, "one two three four five six seven eight"), // disjoint → bp 0
      (3L, "alpha beta gamma delta epsilon other words here") // partial
    ).toDF("doc_id", "text")
    val r = Curation.contaminationReport(d, "doc_id", "text",
        benchPred = col("doc_id") === 0L, n = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(!r.contains(0L), "benchmark rows must not appear in the report")
    assert(r(1L)._2 == r(1L)._1 && r(1L)._3 == 10000L, "exact copy fully contaminated")
    assert(r(2L)._2 == 0L && r(2L)._3 == 0L, "disjoint doc uncontaminated")
    // doc 3: 4 grams total ("alpha beta gamma delta epsilon" is its only
    // benchmark-shared 5-gram) → 1/4 = 2500 bp
    assert(r(3L) == ((4L, 1L, 2500L)), s"partial overlap miscounted: ${r(3L)}")
  }

  test("qualityGate: threshold equals the in-memory exact quantile; approx swap is close") {
    val bps = docs.select(TextOps.qualityBp(col("text")).cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val pos = 0.25 * (bps.length - 1)
    val (lo, hi) = (bps(pos.toInt), bps(math.min(pos.toInt + 1, bps.length - 1)))
    val thr = lo + (hi - lo) * (pos - pos.toInt)
    val expected = docs.select(col("doc_id"), TextOps.qualityBp(col("text")).as("bp"))
      .where(col("bp").cast("double") >= thr).count()
    val got = Curation.qualityGate(docs, "doc_id", "text", q = 0.25).count()
    assert(got == expected, s"gate kept $got docs, reference says $expected")
    assert(got > 0 && got < docs.count(), "gate must drop the bottom quartile only")
    // the documented 100 TB swap: approx_percentile threshold within 10% of
    // exact on this distribution (same plan shape, sketch-bounded memory)
    val approx = docs.select(TextOps.qualityBp(col("text")).as("bp"))
      .agg(approx_percentile(col("bp"), lit(0.25), lit(10000)).cast("double"))
      .collect().head.getDouble(0)
    assert(math.abs(approx - thr) <= 0.1 * math.max(thr, 1.0),
      s"approx threshold $approx vs exact $thr")
  }

  test("scrub: emails/URLs/blocklist redacted, counts exact, clean docs untouched") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = Seq(
      (1L, "contact me@example.com or https://x.io/path spark fast"),
      (2L, "spark spark stream and sparkle"), // sparkle must NOT match (\b)
      (3L, "clean text with no redactions at all"),
      // blocklist word INSIDE a URL: the URL pass redacts it first, so it
      // must NOT count as blocked — n_blocked audits <BLOCKED> substitutions
      (4L, "see https://spark.apache.org for spark docs")
    ).toDF("doc_id", "text")
    val r = Curation.scrub(d, "doc_id", "text", Seq("spark", "stream"))
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getString(2))).toMap
    assert(r(1L) == ((1, md5hex("contact <EMAIL> or <URL> <BLOCKED> fast"))))
    assert(r(2L) == ((3, md5hex("<BLOCKED> <BLOCKED> <BLOCKED> and sparkle"))))
    assert(r(3L) == ((0, md5hex("clean text with no redactions at all"))),
      "clean doc must fingerprint to its original text")
    assert(r(4L) == ((1, md5hex("see <URL> for <BLOCKED> docs"))),
      "a blocklist word inside a URL is <URL>-redacted, not counted blocked")
  }

  test("plan pins: pack window is per-group (no single-partition window); scrub stays narrow") {
    val packPlan = Curation.packSequences(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(packPlan.contains("windowspecdefinition(pack_group"),
      s"window must partition by pack_group:\n$packPlan")
    assert(packPlan.contains("hashpartitioning(pack_group"),
      s"stream order must come from a per-group hash exchange, not a global sort:\n$packPlan")
    val scrubPlan = Curation.scrub(docs, "doc_id", "text", Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(!scrubPlan.contains("hashpartitioning") && !scrubPlan.contains("Join"),
      s"scrub must be a pure narrow projection:\n$scrubPlan")
  }

  test("curate pipeline: composed stages shrink monotonically, hold out the benchmark, and are deterministic") {
    import graft.examples.CurationPipelineDemo
    val out = CurationPipelineDemo.curate(docs)
    val rows = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val inputIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.nonEmpty && rows.subsetOf(inputIds))
    assert(rows.size < inputIds.size, "curation must drop something on this corpus")
    assert(rows.forall(_ % 11 != 0), "benchmark docs must be held out of the corpus")
    assert(out.columns.toSet == Set("doc_id", "text", "pack_group", "n_tokens",
      "start_tok", "chunk_first", "chunk_last"))
    // one lazy program, content-derived decisions → identical under repartition
    val re = CurationPipelineDemo.curate(docs.repartition(13))
      .select("doc_id", "pack_group", "start_tok").collect().toSet
    assert(re == out.select("doc_id", "pack_group", "start_tok").collect().toSet,
      "the composed pipeline must be partition-invariant end to end")
  }

  test("packSequences: contiguous per-group streams, chunk ids consistent, partition-invariant") {
    val out = Curation.packSequences(docs, "doc_id", "text",
      nGroups = 4, chunkTokens = 64)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == docs.count())
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val ordered = grp.sortBy(_._2)
      // stream is contiguous: each start = previous start + previous length
      ordered.foldLeft(0L) { case (expectedStart, (_, id, n, start, cf, cl)) =>
        assert(start == expectedStart, s"doc $id starts at $start, stream says $expectedStart")
        assert(cf == start / 64, s"doc $id chunk_first")
        assert(cl == (start + math.max(n, 1) - 1) / 64 && cl >= cf, s"doc $id chunk_last")
        expectedStart + n
      }
    }
    // layout is content-derived: identical under any input partitioning
    val re = Curation.packSequences(docs.repartition(13), "doc_id", "text",
      nGroups = 4, chunkTokens = 64)
    assert(re.collect().toSet == out.collect().toSet,
      "packing must not depend on input partitioning")
  }

  test("stripBoilerplate: shared spans removed from every doc, unique spans and tails kept") {
    import spark.implicits._
    // span = 4 tokens; "nav bar home login" is the shared boilerplate chunk
    val boiler = "nav bar home login"
    val d = Seq(
      (0L, s"$boiler alpha beta gamma delta tail1"),       // boiler + unique + tail
      (1L, s"$boiler one two three four"),                 // boiler + unique, no tail
      (2L, "five six seven eight extra"),                  // unique only + tail
      (3L, "tiny doc")                                     // shorter than one span
    ).toDF("doc_id", "text")
    val r = Curation.stripBoilerplate(d, "doc_id", "text", spanTokens = 4, minDocs = 2)
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(0L) == (("alpha beta gamma delta tail1", 2L, 1L)),
      s"doc 0 must lose only the shared span: ${r(0L)}")
    assert(r(1L) == (("one two three four", 2L, 1L)))
    assert(r(2L) == (("five six seven eight extra", 1L, 0L)),
      "a chunk unique to one doc must survive")
    assert(r(3L) == (("tiny doc", 0L, 0L)),
      "docs shorter than one span pass through verbatim")
    // a doc that is ALL boilerplate collapses to empty text
    val all = Seq((0L, boiler), (1L, boiler)).toDF("doc_id", "text")
    val rr = Curation.stripBoilerplate(all, "doc_id", "text", spanTokens = 4, minDocs = 2)
      .collect().map(x => (x.getString(1), x.getLong(3))).toSet
    assert(rr == Set(("", 1L)), s"all-boilerplate docs must empty out: $rr")
  }

  test("filterCascade: first failing stage charged, accounting chains, null predicate fails") {
    import spark.implicits._
    val d = Seq(
      (0L, 10, "en"),   // fails stage 1 (and would fail 2 — charged to 1 only)
      (1L, 100, "xx"),  // fails stage 2
      (2L, 100, "en"),  // survives
      (3L, 100, null)   // null predicate at stage 2 → counts as a failure
    ).toDF("doc_id", "n", "lang")
    val out = Curation.filterCascade(d, Seq(
        "big_enough" -> (col("n") >= 50),
        "lang_en" -> (col("lang") === "en")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "big_enough", 4L, 1L, 3L),
      (2, "lang_en", 3L, 2L, 1L)), s"cascade accounting wrong: ${out.toSeq}")
  }

  test("splitLeakage: cross-split shared spans reported, same-side and unique spans not") {
    import spark.implicits._
    // pick ids on opposite sides of the 50% id-hash split by evaluating the
    // split's own bucket function — no magic constants
    val buckets = spark.range(1, 60).toDF("id")
      .select(col("id"), pmod(graft.operators.Dedup.md5Hash48(
        col("id").cast("string")), org.apache.spark.sql.functions.lit(1000L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lo = buckets.collect { case (id, b) if b < 500 => id }.toSeq.sorted
    val hi = buckets.collect { case (id, b) if b >= 500 => id }.toSeq.sorted
    assert(lo.nonEmpty && hi.size >= 2, s"need ids on both sides: $buckets")
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8" // one aligned 8-token span
    val docs = Seq(
      (lo.head, shared + " trainside tail tail tail tail tail tail tail"),
      (hi.head, shared + " evalside tail tail tail tail tail tail tail"),
      // same-side pair sharing a DIFFERENT span — must not be reported
      (hi(1), "h1 h2 h3 h4 h5 h6 h7 h8"),
      (hi.last, "h1 h2 h3 h4 h5 h6 h7 h8")
    ).toDF("doc_id", "text")
    val out = Curation.splitLeakage(docs, "doc_id", "text",
      trainPermille = 500, spanTokens = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 1, s"exactly the cross-split span leaks: ${out.toSeq}")
    assert(out(0)._2 == 1L && out(0)._3 == 1L, s"one doc each side: ${out(0)}")
  }

  test("iqrOutliers: exact Tukey fences, per-group independence, inliers untouched") {
    import spark.implicits._
    // group g holds 102 values (-1000, 1..100, 1000): interpolated
    // q1 = 25.25, q3 = 75.75 (indices 25.25/75.75 of the SORTED set —
    // quartiles include the outliers themselves), IQR = 50.5, fences
    // [-50.5, 151.5]; group h is on a ×1000 scale where 1000 is normal
    val rows = ((1 to 100).map(v => ("g", v.toDouble)) :+ ("g", 1000.0) :+
      ("g", -1000.0)) ++ Seq(("h", 1000.0), ("h", 2000.0), ("h", 3000.0))
    val out = Curation.iqrOutliers(rows.toDF("grp", "v"), "grp", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSet == Set(("g", 1000.0), ("g", -1000.0)),
      s"only group-g extremes are outliers (h's 1000s are normal AT ITS SCALE): ${out.toSeq}")
    val fences = Curation.iqrOutliers(rows.toDF("grp", "v"), "grp", "v")
      .where(col("grp") === "g")
      .select(col("q_lo"), col("q_hi")).distinct().collect()
    assert(fences.length == 1 &&
      fences(0).getDouble(0) == -50.5 && fences(0).getDouble(1) == 151.5,
      s"exact interpolated fences: ${fences.toSeq}")
  }

  test("sourceQuantileNorm: ties share a percentile, endpoints exact, singleton pins to 0") {
    import spark.implicits._
    // source A: qualityBp is a pure function of text, so equal texts tie.
    // 5 docs, two identical → tied ranks share a percentile; the (untied)
    // top must land exactly at 10000 and the bottom at 0.
    val docs = Seq(
      (1L, "a", "A"), (2L, "bb cc dd", "A"), (3L, "bb cc dd", "A"),
      (4L, "eeee ffff gggg hhhh", "A"),
      (5L, "the of and is a to in it that cat sat on the mat again", "A"),
      (6L, "lonely", "B"))
      .toDF("doc_id", "text", "source")
    val out = Curation.sourceQuantileNorm(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(6L)._2 == 0L, "singleton source pins to 0")
    val a = out.filterKeys(_ != 6L)
    assert(a(2L)._1 == a(3L)._1 && a(2L)._2 == a(3L)._2,
      "identical texts must share score AND percentile")
    assert(a.values.map(_._2).min == 0L && a.values.map(_._2).max == 10000L,
      s"endpoints must hit 0 and 10000: $a")
    // percentile order follows score order
    val sorted = a.values.toSeq.sortBy(_._1)
    assert(sorted.map(_._2) == sorted.map(_._2).sorted, "pct monotone in score")
  }

  test("dailyVolumeAnomalies: planted spike flags, uniform days do not") {
    import spark.implicits._
    import java.sql.Timestamp
    // group "a": 14 days at 10 events + 1 spike day at 100 — a single
    // spike among n−1 identical days scores z = √(n−1) exactly (the spike
    // inflates σ), so 15 days puts it at 3.74σ > 3; with only 10 days it
    // would sit at exactly 3σ and the strict > must NOT flag.
    // group "b": uniform days — nothing flags (0 > 0 is false).
    def day(d: Int) = new Timestamp(d * 86400000L)
    val rows =
      (for (d <- 0 until 14; i <- 0 until 10) yield ("a", day(d), i)) ++
        (for (i <- 0 until 100) yield ("a", day(14), i)) ++
        (for (d <- 0 until 10; i <- 0 until 10) yield ("b", day(d), i))
    val df = rows.toDF("g", "ts", "i")
    val out = Curation.dailyVolumeAnomalies(df, "g", "ts", k = 3)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.size == 25)
    assert(out(("a", 14L)) == ((100L, true)), "the spike day must flag")
    assert(out.filterKeys(_ != (("a", 14L))).values.forall(!_._2),
      "no other day flags: uniform days and the spiked group's normal days")
    // the exactly-3σ boundary: 9 identical days + 1 spike ⇒ z = 3, strict
    val b = ((for (d <- 0 until 9; i <- 0 until 10) yield ("c", day(d), i)) ++
      (for (i <- 0 until 100) yield ("c", day(9), i))).toDF("g", "ts", "i")
    assert(Curation.dailyVolumeAnomalies(b, "g", "ts", k = 3)
      .where(col("is_anomaly")).count() == 0, "z = 3 exactly must not flag at k = 3")
  }

  test("distributionDrift: exact share bps, one-sided strata, TVD ties out") {
    import spark.implicits._
    // side A: 60 x, 40 y (10000 bp split 6000/4000)
    // side B: 25 x, 25 y, 50 z (2500/2500/5000)
    val rows = Seq.fill(60)(("x", true)) ++ Seq.fill(40)(("y", true)) ++
      Seq.fill(25)(("x", false)) ++ Seq.fill(25)(("y", false)) ++
      Seq.fill(50)(("z", false))
    val df = rows.toDF("s", "a")
    val out = Curation.distributionDrift(df, "s", col("a"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out == Map(
      "x" -> ((60L, 25L, 6000L, 2500L, 3500L)),
      "y" -> ((40L, 25L, 4000L, 2500L, 1500L)),
      "z" -> ((0L, 50L, 0L, 5000L, 5000L))))
    // Σdelta/2 = TVD×10⁴
    assert(out.values.map(_._5).sum / 2 == 5000L)
  }

  test("kAnonymize: hand-traced ladder — exact, generalized, suppressed-unsafe") {
    import spark.implicits._
    // k=2. (en,a)x2 → level 0. (en,b)x1 + (en,c)x1 → each group small, the
    // generalized (en,*) set holds BOTH rows (2 ≥ k) → level 1. (fr,x)x1 →
    // small, per-lang generalized sum 1 < k → level 2; the corpus-wide
    // suppressed set is that 1 row < k → released=false.
    val docs = Seq(
      (1L, "en", "a"), (2L, "en", "a"),
      (3L, "en", "b"), (4L, "en", "c"),
      (5L, "fr", "x")
    ).toDF("doc_id", "lang", "source")
    val out = Curation.kAnonymize(docs, "doc_id", "lang", "source", k = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == (("en", "a", 0, true)))
    assert(out(2L) == (("en", "a", 0, true)))
    assert(out(3L) == (("en", "*", 1, true)))
    assert(out(4L) == (("en", "*", 1, true)))
    assert(out(5L) == (("*", "*", 2, false)))
  }

  test("kAnonymize: the suppressed rows of ALL q1 values pool into one release group") {
    import spark.implicits._
    // two singleton langs: each alone is < k, but the pooled suppressed
    // ('*','*') tuple covers 2 rows = k → released=true for both
    val docs = Seq(
      (1L, "en", "a"), (2L, "en", "a"),
      (3L, "fr", "x"), (4L, "de", "y")
    ).toDF("doc_id", "lang", "source")
    val out = Curation.kAnonymize(docs, "doc_id", "lang", "source", k = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3), r.getBoolean(4))))
      .toMap
    assert(out(3L) == (("*", "*", 2, true)))
    assert(out(4L) == (("*", "*", 2, true)))
    assert(out(1L)._3 == 0 && out(1L)._4)
  }

  test("kAnonymize: NULL quasi-identifiers form real groups — no row vanishes") {
    import spark.implicits._
    // k=2: the two (null, a) rows are a level-0 group of their own (a null
    // q1 releases as null); the lone (en, null) row generalizes with
    // (en, b) into the (en, *) set of size 2 → both level 1. Every input
    // row must appear exactly once — a privacy release that silently drops
    // null-keyed rows under-reports the corpus (round-13 advice).
    val docs = Seq[(Long, String, String)](
      (1L, null, "a"), (2L, null, "a"),
      (3L, "en", null), (4L, "en", "b")
    ).toDF("doc_id", "lang", "source")
    val out = Curation.kAnonymize(docs, "doc_id", "lang", "source", k = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3), r.getBoolean(4))))
      .toMap
    assert(out.size == 4, s"rows dropped: ${out.keySet}")
    assert(out(1L) == ((null, "a", 0, true)))
    assert(out(2L) == ((null, "a", 0, true)))
    assert(out(3L) == (("en", "*", 1, true)))
    assert(out(4L) == (("en", "*", 1, true)))
  }

  test("kAnonymize: a data value can never merge with the NULL group (round-14 advice)") {
    import spark.implicits._
    // Two SINGLETON release tuples at k=2: (en, NULL) and (en, <U+0000>-the-data-value) —
    // under the old U+0000 string sentinel these counted as ONE group of
    // size 2 and released both values exactly (anon_level 0), overstating
    // k-anonymity for two distinctly-identifiable rows. With (isnull, value)
    // pair keys they are separate level-0-failing groups that generalize
    // together into (en, *) — anonymity set of size 2, level 1.
    val docs = Seq[(Long, String, String)](
      (1L, "en", null), (2L, "en", 0.toChar.toString)
    ).toDF("doc_id", "lang", "source")
    val out = Curation.kAnonymize(docs, "doc_id", "lang", "source", k = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == (("en", "*", 1, true)), s"got ${out(1L)}")
    assert(out(2L) == (("en", "*", 1, true)), s"got ${out(2L)}")
  }

  test("lDiversityAudit: homogeneous class fails, diverse class passes, shares exact") {
    import spark.implicits._
    // class (a, 1): three rows, one sensitive value → NOT 3-diverse,
    // max share 100%; class (a, 2): three rows, three values → 3-diverse,
    // max share 1/3 = 3333 bp (integer-floored)
    val docs = Seq(
      ("a", 1L, "x"), ("a", 1L, "x"), ("a", 1L, "x"),
      ("a", 2L, "x"), ("a", 2L, "y"), ("a", 2L, "z")
    ).toDF("q1", "q2", "s")
    val out = Curation.lDiversityAudit(docs, col("q1"), col("q2"), col("s"), l = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(("a", 1L)) == ((3L, 1L, 10000L, false)))
    assert(out(("a", 2L)) == ((3L, 3L, 3333L, true)))
  }

  test("lDiversityAudit: NULL sensitive is its own disclosure class; NULL quasi is a real class") {
    import spark.implicits._
    // (a, 1) holds {null, x}: 2 distinct sensitive classes (countDistinct
    // would report 1 — the two-level aggregate must not); the null-quasi
    // class appears with its own row.
    val docs = Seq[(String, java.lang.Long, String)](
      ("a", 1L, null), ("a", 1L, "x"),
      (null, null, "x"), (null, null, "x")
    ).toDF("q1", "q2", "s")
    val out = Curation.lDiversityAudit(docs, col("q1"), col("q2"), col("s"), l = 2)
      .collect()
    assert(out.length == 2, s"expected 2 classes, got ${out.length}")
    val byKey = out.map(r => (Option(r.getString(0)), Option(r.get(1))) ->
      ((r.getLong(2), r.getLong(3), r.getBoolean(5)))).toMap
    assert(byKey((Some("a"), Some(1L))) == ((2L, 2L, true)),
      "null sensitive must count as a distinct value")
    assert(byKey((None, None)) == ((2L, 1L, false)),
      "null-quasi class must be audited, and homogeneity flagged")
  }
}
