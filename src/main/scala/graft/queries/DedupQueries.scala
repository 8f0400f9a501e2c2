package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Sources, Tuning}
import graft.functions.SimHash64
import graft.operators.{Dedup, TextOps}

/** Deduplication query registry over `documents`: exact (hash-groupBy),
  * exact set-similarity join (prefix-filtered, oracle-verified against the
  * quadratic form), MinHash-LSH and SimHash near-dup (hash-based — DuckDB
  * cannot reproduce xxhash64, so those two get the driver's rows-only check
  * plus scalatest specs pinning recall against the exact join).
  */
object DedupQueries {

  private def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(Tuning.tune(s), dir)

  /** Planted near-dups in the driver corpus sit at jaccard ≥ 0.9; background
    * pairs at ≤ 0.1 — θ=0.8 separates them with wide margin on both sides. */
  val JaccardThreshold = 0.8

  /** The exact jaccard pair list feeds THREE registered queries (pairs /
    * components / survivors). Compute it once per (session, sf dir) and pin
    * the result (an eager localCheckpoint of the ~pairs-sized output — tiny),
    * so the expensive similarity join runs once instead of three times per
    * bench/verify pass. Keyed by session identity: a stopped session's
    * cached blocks die with it and must not leak into a new one. */
  private val pairsCache =
    scala.collection.concurrent.TrieMap[(Int, String), DataFrame]()
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    pairsCache.getOrElseUpdate((System.identityHashCode(s), dir),
      Dedup.exactJaccardJoin(Sources.documents(s, dir), "doc_id", "text",
        n = 3, threshold = JaccardThreshold).localCheckpoint())

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: full surviving rows, min-doc_id winner per (lang, source).
    "dedup_exact_rows" -> q((s, dir) =>
      Dedup.exact(Sources.documents(s, dir), Seq("lang", "source"), "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Exact dedup survivor keys on a content fingerprint (md5 of text).
    "dedup_fingerprint_survivors" -> q((s, dir) =>
      Dedup.exactKeys(
        Sources.documents(s, dir)
          .withColumn("fp", TextOps.fingerprintMd5(col("text"))),
        Seq("fp"), "doc_id")
        .orderBy(col("fp"))),

    // EXACT n-gram jaccard self-join via prefix filtering — the oracle runs
    // the quadratic all-pairs form; equal output proves recall = 1.0.
    "dedup_jaccard_pairs" -> q((s, dir) =>
      jaccardPairs(s, dir)
        .orderBy(col("id_a"), col("id_b"))),

    // Near-dup components: min-label propagation over the (shared) jaccard
    // pairs. Oracle: recursive-CTE transitive closure in DuckDB.
    "dedup_near_components" -> q((s, dir) =>
      Dedup.connectedComponents(jaccardPairs(s, dir), "id_a", "id_b")
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy(col("doc_id"))),

    // End-to-end near-dedup: survivors = min-id per component + unpaired,
    // reusing the shared pair list (round 2 re-ran the full similarity join
    // inside each of the three dedup queries).
    "dedup_near_survivors" -> q((s, dir) =>
      Dedup.nearDedupSurvivorsFromPairs(
        Sources.documents(s, dir), "doc_id", jaccardPairs(s, dir))
        .orderBy(col("doc_id"))),

    // MinHash-LSH approximate near-dup (verified precision, approx recall).
    // xxhash64-based → no SQL oracle; DedupSpec pins recall vs the exact join.
    "dedup_minhash_lsh" -> q((s, dir) =>
      Dedup.minHashLsh(Sources.documents(s, dir), "doc_id", "text",
        n = 3, threshold = JaccardThreshold)
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash near-dup: 64-bit signature per doc, pairs within hamming ≤ 5
    // (planted near-dups land at ≤5; the small shared vocabulary makes wider
    // radii noisy — simhash is the cheap candidate filter, jaccard verifies).
    // Pigeonhole-banded hamming join (exact, no quadratic scan); native
    // Catalyst expression (SimHash64) — no SQL oracle; spec pins ≡ the
    // brute-force form.
    "dedup_simhash_pairs" -> q((s, dir) => {
      val sigs = Sources.documents(s, dir)
        .select(col("doc_id"),
          SimHash64.simhash64(TextOps.tokens(col("text"))).as("sh"))
      Dedup.simHashNearDupPairs(sigs, "doc_id", "sh", maxHamming = 5)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  /** Shingle CTE body mirroring Dedup.shingles(n=3) INCLUDING the short-doc
    * branch: docs with fewer than n tokens collapse to one whole-doc shingle
    * (the Spark side pins that blank/short docs pair at jaccard 1.0; the
    * plain generate_series form would yield an empty list for them and
    * silently diverge on degenerate corpora). */
  private val shingleBody =
    raw"""  SELECT doc_id,
      |         list_distinct(CASE WHEN len(t) < 3
      |                       THEN [array_to_string(t, ' ')]
      |                       ELSE [array_to_string(t[i:i+2], ' ')
      |                             for i in generate_series(1, len(t)-2)]
      |                       END) AS s
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |        FROM documents)""".stripMargin

  private val shingleCte = s"WITH sh AS (\n$shingleBody)"

  /** Recursive transitive closure over the ≥θ pairs → per-vertex min label.
    * (DuckDB evaluates the UNION-recursive CTE to fixpoint — the SQL twin of
    * Dedup.connectedComponents' label propagation.) */
  private val componentCtes =
    raw"""WITH RECURSIVE sh AS (
      |$shingleBody),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE round(len(list_intersect(a.s, b.s))::double
      |              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
      |edges AS (
      |  SELECT id_a AS s, id_b AS t FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(s, t) AS (
      |  SELECT s, t FROM edges
      |  UNION
      |  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
      |comp AS (
      |  SELECT s AS id, least(s, min(t)) AS c FROM reach GROUP BY s)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact_rows" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY lang, source)
        |ORDER BY doc_id""".stripMargin,

    "dedup_fingerprint_survivors" ->
      """SELECT md5(text) AS fp, min(doc_id) AS doc_id
        |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin,

    "dedup_near_components" ->
      s"""$componentCtes
        |SELECT id AS doc_id, c AS component FROM comp ORDER BY doc_id""".stripMargin,

    "dedup_near_survivors" ->
      s"""$componentCtes
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM comp WHERE c <> id)
        |ORDER BY doc_id""".stripMargin,

    "dedup_jaccard_pairs" ->
      raw"""$shingleCte
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.s, b.s))::double
        |             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.s, b.s))::double
        |            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin
  )
}
