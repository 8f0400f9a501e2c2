package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-9 queries whose scale story is a PLAN property
  * (the Round8PlansSpec discipline): asserted on the executed plan string so
  * a refactor that silently re-derives the corpus side of the indexed
  * screen, or un-prunes a scan, fails the suite. */
class Round9PlansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("dedup_incremental_indexed plan: corpus side from the stored index, documents scans are batch-only") {
    val p = plan("dedup_incremental_indexed")
    assert(p.contains("graft_dedup_idx"),
      s"corpus side must scan the persisted index:\n$p")
    // Every documents.parquet scan is the BATCH side: the pushed filter
    // carries the doc_id % 5 = 4 arrival predicate. A corpus-side text
    // re-derivation would surface as a documents scan without it.
    val docScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents"))
      .toSeq
    assert(docScans.nonEmpty, s"batch side reads documents:\n$p")
    // The inline form scans documents for BOTH sides; the indexed form's
    // corpus fp/bands/shingles come from three index scans instead.
    val idxScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft_dedup_idx"))
      .size
    assert(idxScans >= 3,
      s"fp, bands and shingles must each be read from the index (saw $idxScans):\n$p")
  }
}
