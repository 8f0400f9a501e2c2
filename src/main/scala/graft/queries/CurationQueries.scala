package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Sources, Tuning}
import graft.operators.Curation

/** Corpus-curation query registry over the `documents` table: benchmark
  * decontamination, quantile quality gating, sequence packing — the passes a
  * pretraining pipeline runs between raw text and the training shard writer.
  * Scale commentary lives on the [[graft.operators.Curation]] operators.
  */
object CurationQueries {

  private def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(Tuning.tune(s), dir)

  /** Deterministic benchmark membership for the decontamination demo: every
    * 11th doc plays the held-out eval set. */
  private val BenchMod = 11

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Train/eval n-gram decontamination: distinct 5-gram overlap of every
    // non-benchmark doc against the benchmark docs' gram set.
    "text_decontam" -> q((s, dir) =>
      Curation.contaminationReport(Sources.documents(s, dir), "doc_id", "text",
        benchPred = col("doc_id") % BenchMod === 0, n = 5)
        .orderBy(col("doc_id"))),

    // Quantile quality gate: drop the bottom quality quartile.
    "text_quality_gate" -> q((s, dir) =>
      Curation.qualityGate(Sources.documents(s, dir), "doc_id", "text", q = 0.25)
        .orderBy(col("doc_id"))),

    // Concat-and-chunk sequence packing into 256-token context windows,
    // 8 content-hash pack groups.
    "pack_sequences" -> q((s, dir) =>
      Curation.packSequences(Sources.documents(s, dir), "doc_id", "text",
        nGroups = 8, chunkTokens = 256)
        .orderBy(col("pack_group"), col("doc_id"))),

    // Blocklist/PII scrub: redaction count + post-scrub fingerprint. The
    // blocklist words occur in this corpus so real redactions are compared;
    // the email/URL patterns are exercised on synthetic rows in CurationSpec.
    "text_scrub" -> q((s, dir) =>
      Curation.scrub(Sources.documents(s, dir), "doc_id", "text",
        blocklist = ScrubBlocklist)
        .orderBy(col("doc_id")))
  )

  private val ScrubBlocklist = Seq("spark", "stream")

  private val toks = raw"regexp_split_to_array(trim(text), '\s+')"

  /** Distinct word 5-gram list in DuckDB — mirrors NGramShingles semantics:
    * fewer than n tokens → ONE shingle of all tokens space-joined. DuckDB
    * list slicing tk[i:j] is inclusive; range(a,b) is half-open. */
  private val grams5 =
    raw"""list_distinct(CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
         |  ELSE list_transform(range(1, len(tk) - 3), i -> array_to_string(tk[i:i+4], ' ')) END)""".stripMargin

  /** Integer quality bp — the TextOps.qualityBp twin (same component
    * expressions as the text_quality oracle, before the final division). */
  private val qualityBp =
    raw"""(least(length(text) * 20, 10000) * 4
         | + least((len(list_filter($toks, t -> list_contains(['the','a','an','of','and','to','in','is','it','that'], t))) * 50000) // len($toks), 10000) * 3
         | + greatest(10000 - (length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 100000) // length(text), 0) * 3)""".stripMargin

  val oracles: Map[String, String] = Map(

    "text_decontam" ->
      raw"""WITH tok AS (SELECT doc_id, $toks AS tk FROM documents),
        |sh AS (SELECT doc_id, $grams5 AS grams FROM tok),
        |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM sh WHERE doc_id % $BenchMod = 0),
        |hits AS (
        |  SELECT s.doc_id, count(*) AS n_contaminated
        |  FROM (SELECT doc_id, unnest(grams) AS gram FROM sh WHERE doc_id % $BenchMod <> 0) s
        |  JOIN bench USING (gram) GROUP BY s.doc_id)
        |SELECT s.doc_id, len(s.grams)::bigint AS n_grams,
        |       coalesce(h.n_contaminated, 0)::bigint AS n_contaminated,
        |       CASE WHEN len(s.grams) = 0 THEN 0
        |            ELSE coalesce(h.n_contaminated, 0) * 10000 // len(s.grams)
        |       END::bigint AS contamination_bp
        |FROM sh s LEFT JOIN hits h USING (doc_id)
        |WHERE s.doc_id % $BenchMod <> 0 ORDER BY s.doc_id""".stripMargin,

    // quantile_cont ≡ Spark percentile: linear interpolation over the sorted
    // exact integers; at q = 1/4 the interpolation fraction is a quarter —
    // every intermediate is double-exact, so >= threshold is engine-stable.
    "text_quality_gate" ->
      raw"""WITH s AS (SELECT doc_id, $qualityBp::bigint AS quality_bp FROM documents),
        |t AS (SELECT quantile_cont(quality_bp, 0.25) AS thr FROM s)
        |SELECT s.doc_id, s.quality_bp FROM s, t
        |WHERE s.quality_bp >= t.thr ORDER BY s.doc_id""".stripMargin,

    // Same scrub pipeline in DuckDB (RE2): Spark regexp_replace is
    // replace-all by default → 'g' flag; md5(text) ≡ Spark md5(utf8 bytes).
    "text_scrub" ->
      raw"""SELECT doc_id,
        |  len(regexp_extract_all(text, '\b(spark|stream)\b'))::int AS n_blocked,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        'https?://[^\s]+', '<URL>', 'g'),
        |        '\b(spark|stream)\b', '<BLOCKED>', 'g')) AS scrubbed_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      raw"""WITH s AS (
        |  SELECT doc_id, len($toks)::bigint AS n_tokens,
        |         (${DedupQueries.hexFold48("text")} % 8)::bigint AS pack_group
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
        |  FROM s)
        |SELECT pack_group, doc_id, n_tokens, start_tok::bigint AS start_tok,
        |       (start_tok // 256)::bigint AS chunk_first,
        |       ((start_tok + greatest(n_tokens, 1) - 1) // 256)::bigint AS chunk_last
        |FROM c ORDER BY pack_group, doc_id""".stripMargin
  )
}
