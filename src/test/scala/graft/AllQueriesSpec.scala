package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry invariants across every query registry (the per-registry
  * specs cover semantics; this catches a registration regression anywhere):
  * every registered query yields rows on the smallest sf, and every query
  * either has oracle SQL or is one of the known intrinsically
  * non-SQL-reproducible ones. */
class AllQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  /** Queries whose exact results cannot be reproduced in DuckDB by design —
    * every other query MUST carry oracle SQL. Empty since round 7: the
    * approx-distinct query pins its ±5% bound inside the compared output,
    * the fake-decode query registers its md5-48 variant, and
    * dedup_simhash_xxhash embeds its Spark-computed signatures into
    * generated SQL at oracle-dump time. */
  private val knownRowsOnly = Set.empty[String]

  test("every registered query returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (fn(spark, dir).count() == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }

  test("no registered query plans an all-pairs join (cartesian / BNLJ)") {
    // Deliberate exceptions: both scoring joins broadcast the (small by
    // definition) QUERY set against one corpus scan with a non-equi
    // self-exclusion — a bounded broadcast nested loop, not a corpus×corpus
    // blowup (sim_topk_pq reads only the m code ints per corpus row).
    // text_quality_gate (+ its approx twin), agg_hll_union,
    // text_filter_cascade (the corpus total) and sample_mixture_lang (the
    // max-achievable-total scalar) cross-join ONE-row aggregate scalars —
    // the broadcast side is a single row by construction. Everything else
    // must stay equi.
    // sim_semantic_screen joins the same way: the held-out EVAL suite
    // broadcasts (small by definition) with the cosine threshold inside the
    // join condition — one corpus scan, bounded broadcast side.
    // sim_ann_recall embeds the brute-force GROUND-TRUTH side (that is the
    // point of a recall harness) — the same bounded broadcast NLJ as
    // sim_topk_bruteforce; the IVF side under test stays equi.
    // sketch_kmv_intersect enumerates GROUP PAIRS (g_a < g_b) over the
    // sketch table — |groups| rows of k longs each, metadata cardinality
    // AFTER the one corpus aggregate; the pair join is bounded by
    // construction (5 langs → 10 pairs), the same class as the one-row
    // scalar cross-joins above.
    val allowed = Set("sim_topk_bruteforce", "sim_topk_pq",
      "sim_semantic_screen", "sim_ann_recall",
      "text_quality_gate", "text_quality_gate_approx", "agg_hll_union",
      "text_filter_cascade", "sample_mixture_lang", "sketch_kmv_intersect",
      // same bounded group-pair class as sketch_kmv_intersect (a-not-b)
      "sketch_kmv_diff")
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (allowed(name)) None
      else {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    }
    assert(offenders.isEmpty, s"all-pairs plans detected: $offenders")
  }

  test("no compared output carries array/map columns") {
    // The driver's comparator hashes rows after a pandas sort; array/map
    // cells are unhashable there (r7's text_postings crash), so the
    // registry-wide rule is: complex values are stringified (array_join)
    // before they reach a compared output. Operators keep their typed
    // array APIs — only the registered query surface is constrained.
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val bad = fn(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType] => f.name
      }
      if (bad.nonEmpty) Some(s"$name(${bad.mkString(",")})") else None
    }
    assert(offenders.isEmpty,
      s"array/map columns in compared outputs: $offenders")
  }

  test("oracle-artifact capture never fires outside Verify") {
    // dedup_simhash_xxhash's oracle embeds a per-document signature dump —
    // a corpus-sized driver collect that must only run under Verify's
    // capture flag (at 100 TB it is a driver OOM in the bench path).
    assume(!graft.queries.OracleCapture.enabled)
    graft.queries.DedupQueries.queries("dedup_simhash_xxhash")(spark, dir)
      .count()
    assert(graft.queries.DedupQueries.capturedSimhashDirs.isEmpty,
      "signature capture ran without the Verify capture flag")
  }

  test("oracle coverage is total outside the documented rows-only set") {
    // sim_topk_ivf's oracle appears once its quantizer has trained (Verify
    // always runs queries before the oracle dump; in a bare test JVM the
    // cache may be empty) — tolerate its absence, never anything else's.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // runtime-artifact oracles (IVF centroids, PQ codebooks, embedded
    // SimHash signatures) only exist after their queries have run —
    // tolerate their absence in a bare JVM, never anything else's.
    val trainedOracles = Set("sim_topk_ivf", "sim_topk_ivf_indexed",
      "sim_topk_ivf_incremental", "sim_topk_ivf_deleted",
      "sim_pq_codes", "sim_topk_pq",
      "sim_topk_ivfpq", "sim_topk_ivfpq_indexed", "sim_topk_ivfpq_incremental",
      "stream_semantic_screen_indexed",
      "dedup_simhash_xxhash", "dedup_simhash128_pairs",
      "sim_semdedup_pairs", "sim_semdedup_survivors", "multimodal_phash_pairs",
      "multimodal_segment_dup_assets", "multimodal_cdc_segment_dup")
    assert((missing -- trainedOracles) == knownRowsOnly,
      s"oracle-less queries changed: got $missing, expected $knownRowsOnly (+ $trainedOracles pre-training)")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a registered query: $orphans")
  }
}
