package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-8 queries whose scale story is a PLAN property —
  * asserted on the executed plan string so a refactor that silently
  * reintroduces a global sort, a shuffled dimension join, or an unpruned
  * scan fails the suite (the RefParityQueriesSpec discipline). */
class Round8PlansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("text_bm25 plan: df broadcast, documents scan pruned to (doc_id, text)") {
    val p = plan("text_bm25")
    assert(p.contains("BroadcastHashJoin"), s"|terms|-row df side must broadcast:\n$p")
    val scans = p.linesIterator.filter(_.contains("FileScan")).mkString("\n")
    assert(!scans.contains("lang") && !scans.contains("source"),
      s"bm25 reads only doc_id+text; scan not pruned:\n$scans")
  }

  test("corpus_length_batches plan: numbering shuffles by bucket, only the output ORDER BY range-partitions") {
    val p = plan("corpus_length_batches")
    val rangeExchanges = "rangepartitioning".r.findAllIn(p.toLowerCase).size
    assert(rangeExchanges == 1,
      s"two-level numbering must not global-sort (1 range exchange = the output ORDER BY):\n$p")
    assert(p.contains("Window"), s"per-bucket window missing:\n$p")
  }

  test("text_cdc_chunks plan: map-only chunking — no join, no aggregate, no hash shuffle") {
    val p = plan("text_cdc_chunks")
    assert(!p.contains("Join"), s"CDC chunking must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"CDC chunking must not aggregate:\n$p")
    assert(!p.toLowerCase.contains("exchange hashpartitioning"),
      s"CDC chunking is a narrow map — no hash shuffle:\n$p")
  }

  test("corpus_drift_by_source plan: one aggregate pass, scan pruned to (doc_id, source)") {
    val p = plan("corpus_drift_by_source")
    val scans = p.linesIterator.filter(_.contains("FileScan")).mkString("\n")
    assert(!scans.contains("text"),
      s"drift never reads document text; scan not pruned:\n$scans")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffled join in a one-pass report:\n$p")
  }
}
