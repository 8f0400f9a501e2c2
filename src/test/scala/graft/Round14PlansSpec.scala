package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-14 queries whose scale story is a PLAN property
  * (the Round8/Round9PlansSpec discipline): asserted on the executed plan
  * string so a refactor that re-interprets the tokenizer loop, shuffles the
  * MERGE target, or turns the merkle audit into a row-level join fails the
  * suite rather than the bench.
  */
class Round14PlansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def executed(name: String): org.apache.spark.sql.DataFrame = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // AQE finalizes at execution
    df
  }
  private def plan(name: String): String =
    executed(name).queryExecution.executedPlan.toString

  test("text_bpe_encode_indexed plan: the fused native expression, inside codegen, no join/shuffle before the sort") {
    val p0 = plan("text_bpe_encode_indexed")
    // AQE prints Final + Initial sections; pin the FINAL plan only
    val p = p0.split("== Initial Plan ==").head
    assert(p.contains("bpe_encode_ids"),
      s"encode must ride the fused native expression:\n$p")
    assert(!p.contains("transform("),
      s"no interpreted HOF lambda may remain on the encode path:\n$p")
    assert(!p.contains("Join"), s"encoding is one narrow map — no join:\n$p")
    // exactly one exchange: the presentation orderBy's range partitioning
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1,
      s"encode scan must not shuffle (1 presentation exchange allowed, saw $exchanges):\n$p")
  }

  test("text_bpe_decode_roundtrip plan: native decode, no scalar-subquery map on the id path") {
    val p = plan("text_bpe_decode_roundtrip")
    assert(p.contains("bpe_decode_syms"),
      s"decode must ride the fused native expression:\n$p")
    assert(p.contains("bpe_encode_ids"),
      s"the contained encode must stay native too:\n$p")
  }

  test("corpus_merge_upsert plan: target anti-joins BROADCAST source ids — the corpus never shuffles") {
    val p = plan("corpus_merge_upsert")
    assert(p.contains("LeftAnti"), s"MERGE drops touched ids via anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the delta-sized id set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the target side must not sort-merge shuffle:\n$p")
  }

  test("corpus_merkle_audit plan: the corpus reduces BEFORE the audit join — join inputs are bucket-sized aggregates") {
    val df = executed("corpus_merkle_audit")
    val p = df.queryExecution.executedPlan.toString
    // the full-outer audit join compares 64-row summaries; both sides must
    // be aggregates, so the join reads |buckets| rows, never corpus rows
    val joinIdx = p.indexOf("FullOuter")
    assert(joinIdx >= 0, s"audit compares summaries via full outer join:\n$p")
    val above = p.substring(0, joinIdx)
    assert(!above.contains("FileScan"),
      s"no corpus scan may sit ABOVE the audit join — summaries join, rows don't:\n$p")
    assert(df.collect().length == 64, "one audit row per bucket")
  }

  test("sketch_hdr_quantiles plan: ALL rows derive from the per-flag partials (no second corpus scan for the merge)") {
    val p = plan("sketch_hdr_quantiles")
    // one lineitem scan feeds the per-flag histogram; the ALL merge and
    // every rank probe read the pinned |buckets|-row checkpoint
    val scans = p.linesIterator
      .count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(scans <= 1,
      s"the merge must reuse the partial sketches, not re-scan the corpus (saw $scans lineitem scans):\n$p")
  }

  test("layout_stats_skipped_scan: the pruned read lists fewer files than the layout holds") {
    // sf0.01: with ~940 rows per z-range file, each file sits inside one
    // 2^12 z-block, so the interleaved a-bits are constant per file and
    // the min_a envelopes actually discriminate. (At sf0.001 the range
    // boundaries straddle blocks — envelopes go wide and pruning honestly
    // keeps everything; correctness is unaffected either way.)
    val df = SparkEntry.queries("layout_stats_skipped_scan")(
      spark, "/root/testdata/sf0.01")
    df.collect()
    val total = spark.read.parquet(
      df.inputFiles.head.replaceAll("/[^/]+$", "")).inputFiles.length
    assert(df.inputFiles.length < total,
      s"stats planner must drop files: read ${df.inputFiles.length} of $total")
  }
}
