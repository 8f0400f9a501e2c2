package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a pretraining-data pipeline runs after the
  * per-document signals ([[TextOps]]) and dedup ([[Dedup]]) passes:
  * benchmark decontamination, quantile-threshold quality gating, and
  * sequence packing for context-window training layouts.
  *
  * Scale shape, per operator:
  *   - [[contaminationReport]]: the benchmark n-gram set is tiny relative to
  *     the corpus (eval suites are MBs against 100 TB), so the membership
  *     join broadcasts the benchmark side — AQE sees the runtime exchange
  *     size and picks that automatically; the per-doc hit count is one
  *     bounded aggregation shuffle.
  *   - [[qualityGate]] / [[qualityGateApprox]]: the threshold is ONE scalar
  *     row joined by broadcast — the corpus is touched by a narrow scan +
  *     filter only. The exact interpolated percentile aggregates every value
  *     into one buffer, so [[qualityGateApprox]] (`approx_percentile`:
  *     sketch-bounded memory, same plan shape) is the at-scale default;
  *     exact is the small-scale verifiability variant. CurationSpec pins the
  *     two within tolerance, and the registered query pins the approx
  *     threshold/kept-count inside exact rank bands.
  *   - [[packSequences]]: windows run per pack-group, and groups come from a
  *     content hash — set `nGroups` ≈ cluster parallelism × O(100) at scale
  *     and each window partition stays bounded (corpus_size / nGroups);
  *     there is no global sort or single-partition window anywhere.
  */
object Curation {

  /** Benchmark-contamination report (train/eval overlap detection): for
    * every non-benchmark document, how many of its distinct word `n`-grams
    * appear in ANY benchmark document (`benchPred` selects the benchmark
    * rows), as a count and an integer-basis-point rate.
    *
    * This is the standard decontamination primitive: n-gram overlap against
    * a held-out eval set, computed as one equi-join on the gram — never a
    * doc×doc comparison. Output columns: doc_id, n_grams, n_contaminated,
    * contamination_bp.
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          benchPred: Column, n: Int = 5): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), benchPred.as("is_bench"),
      Dedup.shingles(col(textCol), n).as("grams"))
    val bench = sh.where(col("is_bench"))
      .select(explode(col("grams")).as("gram")).distinct()
    val corpus = sh.where(!col("is_bench"))
    // grams are distinct per doc and bench grams are distinct, so the inner
    // join yields each (doc, gram) at most once — count(*) IS the overlap.
    val hits = corpus.select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(bench, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    corpus.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      // integer floor division (Spark `div` ≡ DuckDB `//`): floor over the
      // double quotient is exact only while hits*10⁴ stays within the
      // 2⁵³ mantissa — past ~4e8 grams the correctly-rounded double can land
      // ON an integer the true quotient is just below, and floor() would
      // disagree with integer floor-div. `div` keeps bit-parity at any size.
      .withColumn("contamination_bp",
        when(col("n_grams") === 0L, lit(0L))
          .otherwise(expr("n_contaminated * 10000 div n_grams")))
  }

  /** K-ANONYMITY generalization ladder over two quasi-identifier columns —
    * the release-hygiene pass a corpus with per-document metadata needs
    * before the metadata ships alongside the text: a (q1, q2) combination
    * seen on fewer than `k` documents identifies its authors too precisely.
    * Three deterministic levels, decided per row:
    *
    *   - level 0 (exact): the row's (q1, q2) group has ≥ k rows — release
    *     both values as-is;
    *   - level 1 (generalized): too-small groups drop q2 → `"*"`; the
    *     anonymity set of a generalized row is the rows generalized WITH
    *     it (only they share the released (q1, "*") tuple), so the check
    *     is Σ n₀ over the small groups per q1 — not the raw q1 count;
    *   - level 2 (suppressed): still < k after generalizing — both values
    *     redact to `"*"`; the suppressed rows of ALL q1 values form one
    *     release group, so a corpus-wide Σ (1-row scalar) decides whether
    *     even that tuple is safe; if it isn't, the rows are marked
    *     `released = false` (drop them before shipping).
    *
    * Scale shape: two bounded aggregates (|q1×q2| and |q1| group tables —
    * metadata-cardinality, not corpus-cardinality) broadcast back onto one
    * narrow corpus scan; no corpus-sized shuffle at any k. Output:
    * (idCol, q1_out, q2_out, anon_level, released).
    *
    * NULL quasi-identifiers are legitimate release-tuple values: grouping
    * and join-back key on the PAIR (isnull(q), coalesce(q, "")) — null is a
    * distinct key that no data value can collide with — so null-keyed
    * documents COUNT toward and RECEIVE an anon_level like any other; a
    * privacy op must account for every input row, never silently drop the
    * null-keyed ones (round-13 advice). A string sentinel would be wrong
    * here (round-14 advice): a corpus containing the old U+0000 sentinel as a REAL value
    * would merge with the null group, and two singleton release tuples
    * could pass as one size-k group — overstating k-anonymity. A level-0
    * null releases as null. `"*"` is the RESERVED generalization
    * sentinel in the released columns: inputs containing a literal `"*"`
    * still anonymize correctly (release sets only union, anonymity is not
    * weakened), but consumers keying on the released tuple alone cannot
    * distinguish a real `(q1,"*")` from a generalized row — documented
    * contract, enforceable upstream with a filter if the corpus allows. */
  def kAnonymize(docs: DataFrame, idCol: String, q1: String, q2: String,
                 k: Long): DataFrame = {
    require(k >= 1, "k >= 1")
    val keyed = docs
      .withColumn("__k1n", isnull(col(q1)))
      .withColumn("__k1", coalesce(col(q1).cast("string"), lit("")))
      .withColumn("__k2n", isnull(col(q2)))
      .withColumn("__k2", coalesce(col(q2).cast("string"), lit("")))
    val g0 = keyed
      .groupBy(col("__k1n"), col("__k1"), col("__k2n"), col("__k2"))
      .agg(count(lit(1)).as("__n0"))
    val g1 = g0.where(col("__n0") < k)
      .groupBy(col("__k1n"), col("__k1")).agg(sum(col("__n0")).as("__n1"))
    val suppressedTotal = g1.where(col("__n1") < k)
      .agg(coalesce(sum(col("__n1")), lit(0L)).as("n")).select(col("n"))
    keyed
      .join(broadcast(g0), Seq("__k1n", "__k1", "__k2n", "__k2"))
      .join(broadcast(g1), Seq("__k1n", "__k1"), "left")
      .withColumn("anon_level",
        when(col("__n0") >= k, lit(0))
          .when(coalesce(col("__n1"), lit(0L)) >= k, lit(1))
          .otherwise(lit(2)))
      .withColumn("released",
        col("anon_level") < 2 || suppressedTotal.scalar() >= k)
      .select(col(idCol),
        when(col("anon_level") === 2, lit("*")).otherwise(col(q1))
          .as(s"${q1}_out"),
        when(col("anon_level") >= 1, lit("*")).otherwise(col(q2))
          .as(s"${q2}_out"),
        col("anon_level"), col("released"))
  }

  /** L-DIVERSITY audit — the homogeneity-attack check k-anonymity alone
    * misses: a released quasi-identifier tuple shared by ≥ k rows still
    * leaks the sensitive attribute when every row in the class carries the
    * SAME sensitive value. One row per equivalence class (q1, q2) with its
    * size, the number of DISTINCT sensitive values it contains, the largest
    * single sensitive value's share in integer basis points, and the
    * distinct-l-diversity verdict (`n_sensitive >= l`).
    *
    * NULL handling: classes key on the raw columns (GROUP BY treats NULLs
    * as one group identically in Spark and DuckDB — no sentinel, the
    * round-14 kAnonymize lesson), and a NULL sensitive value COUNTS as one
    * distinct value ("sensitive attribute missing" is itself a disclosure
    * class) — hence the two-level aggregate instead of countDistinct, which
    * would silently skip NULLs in both engines.
    *
    * Scale shape: two hash aggregates, both partitioned on the class key;
    * the first reduces the corpus to |classes × sensitive-values| rows
    * map-side, the second to |classes|. Metadata-cardinality output; no
    * corpus-sized shuffle, no window. */
  def lDiversityAudit(docs: DataFrame, q1: Column, q2: Column,
                      sensitive: Column, l: Int): DataFrame = {
    require(l >= 1, "l >= 1")
    docs.select(q1.as("__q1"), q2.as("__q2"), sensitive.as("__s"))
      .groupBy(col("__q1"), col("__q2"), col("__s"))
      .agg(count(lit(1)).as("__ns"))
      .groupBy(col("__q1"), col("__q2"))
      .agg(sum(col("__ns")).as("n"),
        count(lit(1)).as("n_sensitive"),
        expr("max(__ns) * 10000 div sum(__ns)").as("max_share_bp"))
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Quantile-threshold quality gate: keep documents whose integer quality
    * score ([[TextOps.qualityBp]]) is at or above the corpus `q`-quantile
    * (exact linear interpolation — Spark `percentile` ≡ DuckDB
    * `quantile_cont`, computed over exact integers so the threshold double
    * is bit-identical across engines). Output: doc_id, quality_bp.
    *
    * The threshold is a 1-row aggregate broadcast against the scored scan —
    * the bounded-by-construction broadcast nested loop (one row), not a
    * corpus×corpus product.
    */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
                  q: Double = 0.25): DataFrame =
    gateScored(scoreQuality(docs, idCol, textCol), q)

  /** The at-scale default form of [[qualityGate]]: `approx_percentile`
    * (KLL-sketch, rank error ≤ n/`accuracy`) instead of the exact
    * interpolated percentile, whose single aggregation buffer holds every
    * value — unbounded state at corpus scale. Identical plan shape (1-row
    * broadcast threshold × narrow filter scan); only the threshold
    * aggregate's memory bound changes. Exact stays the sf-scale
    * verifiability variant; the registered `text_quality_gate_approx` query
    * pins this form's threshold and kept-count inside exact rank bands. */
  def qualityGateApprox(docs: DataFrame, idCol: String, textCol: String,
                        q: Double = 0.25, accuracy: Int = 10000): DataFrame =
    gateScored(scoreQuality(docs, idCol, textCol), q, approxAccuracy = Some(accuracy))

  /** The scoring pass alone: (doc_id, quality_bp). Exposed so a caller can
    * materialize it ONCE and feed both a gate and any threshold/band
    * diagnostics — the regex-heavy scoring is the expensive part of the
    * gate's two corpus passes. */
  def scoreQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextOps.qualityBp(col(textCol)).as("quality_bp"))

  /** Gate over a pre-scored (doc_id, quality_bp) frame; `approxAccuracy`
    * picks the sketch threshold (Some) or the exact interpolated one
    * (None). */
  def gateScored(scored: DataFrame, q: Double,
                 approxAccuracy: Option[Int] = None): DataFrame = {
    val thrAgg = approxAccuracy match {
      case Some(acc) =>
        percentile_approx(col("quality_bp"), lit(q), lit(acc)).cast("double")
      case None => percentile(col("quality_bp"), lit(q))
    }
    val thr = scored.agg(thrAgg.as("thr"))
    scored.crossJoin(broadcast(thr))
      .where(col("quality_bp").cast("double") >= col("thr"))
      .select(col("doc_id"), col("quality_bp"))
  }

  /** PER-SOURCE QUANTILE NORMALIZATION of the quality score: a raw
    * threshold gate applied corpus-wide systematically biases the mix —
    * sources have different score DISTRIBUTIONS (books score high on the
    * length band, chat logs low), so one global cut keeps all of one source
    * and none of another. Normalizing each doc's score to its within-source
    * percentile makes "keep the best X% of EACH source" expressible as a
    * single threshold on pct_bp — the standard per-domain calibration step
    * before mixing (the CCNet per-language-bucket idea applied to sources).
    *
    * pct_bp = (rank − 1) · 10000 div (n − 1): integer basis points of the
    * classic percent_rank, computed with value-ties sharing a rank (ties
    * MUST share a percentile — a unique-ordered row_number would split
    * equal scores across the gate boundary nondeterministically w.r.t. the
    * tie column); single-doc sources pin to 0. All-integer → hash-exact in
    * any engine.
    *
    * Shape: one narrow scoring scan, one per-source window (rank + count
    * need the same partition). The window sorts per SOURCE, parallel
    * across sources — fine while no single source dwarfs the cluster; a
    * corpus dominated by one giant source should bucket the window like
    * [[graft.operators.Layout.compactionPlan]]'s two-level form.
    * Output: (doc_id, groupCol, quality_bp, pct_bp). */
  def sourceQuantileNorm(docs: DataFrame, idCol: String, textCol: String,
                         groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col(idCol).as("doc_id"), col(groupCol),
      TextOps.qualityBp(col(textCol)).as("quality_bp"))
    val part = Window.partitionBy(col(groupCol))
    val w = part.orderBy(col("quality_bp"))
    scored
      .withColumn("__rk", rank().over(w))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("pct_bp",
        when(col("__n") === 1L, lit(0L))
          .otherwise(expr("(__rk - 1) * 10000 div (__n - 1)").cast("long")))
      .select(col("doc_id"), col(groupCol), col("quality_bp"), col("pct_bp"))
  }

  /** Blocklist / PII scrubbing (the C4-style redaction pass): replace
    * email addresses, URLs, and blocklisted words with placeholder tokens,
    * and count the redactions. A pure narrow projection — regex scrub rides
    * the scan at 100 TB, and the redaction count is a cheap audit signal
    * for downstream filtering (drop docs above a redaction-rate threshold).
    *
    * Patterns are chosen to be engine-portable (same semantics in Java
    * regex and RE2): no backreferences, no lookbehind. Output: doc_id,
    * n_blocked (the exact number of `<BLOCKED>` substitutions — counted on
    * the email/URL-redacted text, because the block pass runs AFTER those
    * redactions: a blocklist word inside a URL or email address is redacted
    * as `<URL>`/`<EMAIL>`, never `<BLOCKED>`, and must not inflate the
    * audit count), scrubbed_md5 (fingerprint of the scrubbed text — lets a
    * pipeline dedup on post-scrub content without shipping the text twice).
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
            blocklist: Seq[String]): DataFrame = {
    val re = lit(blockRegex(blocklist))
    // stage the email/URL pass once; count and final block-replace both read
    // it (CollapseProject leaves non-cheap regex aliases staged, and even a
    // collapse would only duplicate work, not change results)
    docs.select(col(idCol).as("doc_id"),
        scrubEmailUrl(col(textCol)).as("pre"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("pre"), re, lit(0))).as("n_blocked"),
        md5(regexp_replace(col("pre"), re, lit("<BLOCKED>")).cast("binary"))
          .as("scrubbed_md5"))
  }

  private def blockRegex(blocklist: Seq[String]): String = {
    require(blocklist.nonEmpty && blocklist.forall(_.matches("[A-Za-z0-9]+")),
      "blocklist must be plain alphanumeric words (they are spliced into a regex)")
    blocklist.mkString("\\b(", "|", ")\\b")
  }

  /** The email/URL redaction pass alone — the stage [[scrub]] counts
    * blocklist hits AFTER (so the count audits actual `<BLOCKED>`
    * substitutions). */
  private def scrubEmailUrl(text: Column): Column = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val urlRe = "https?://[^\\s]+"
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), urlRe, "<URL>")
  }

  /** The scrub transform itself, as a reusable Column (the pipeline form —
    * [[graft.examples.CurationPipelineDemo]] — rewrites `text` in place and
    * feeds every downstream stage the redacted corpus). */
  def scrubText(text: Column, blocklist: Seq[String]): Column =
    regexp_replace(scrubEmailUrl(text), blockRegex(blocklist), "<BLOCKED>")

  /** Filter-cascade attrition report — the observability primitive of a
    * curation pipeline: given an ORDERED list of named keep-predicates (the
    * RefinedWeb/Gopher filter chain shape), report per stage how many
    * documents entered, were dropped there, and survived. A doc charges its
    * drop to the FIRST failing stage (cascade semantics — later filters
    * never see it), so the corpus is scanned ONCE: the first-failing-stage
    * index is a single `when`-chain column, the per-stage counts are one
    * tiny aggregate (≤ |filters|+1 rows), and the in/out running totals are
    * a window over that metadata-sized table — explicitly NOT a per-stage
    * corpus pass (n stages would cost n scans and n actions).
    *
    * A predicate evaluating to null counts as a failure (a doc you can't
    * score is a doc you drop — the conservative curation default).
    *
    * Output: (stage, name, n_in, n_dropped, n_out), one row per filter in
    * cascade order; n_out of stage k = n_in of stage k+1.
    */
  def filterCascade(docs: DataFrame,
                    filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "need at least one filter")
    require(filters.map(_._1).distinct.size == filters.size,
      "filter names must be unique")
    val spark = docs.sparkSession
    import spark.implicits._
    // 1-based index of the first failing predicate; 0 = survived all.
    val firstFail = filters.zipWithIndex.foldRight(lit(0)) {
      case (((_, pred), i), rest) =>
        when(!coalesce(pred, lit(false)), lit(i + 1)).otherwise(rest)
    }
    // pinned: the tiny per-stage count table feeds BOTH the report join and
    // the total — without the pin each consumer re-executes the corpus scan
    // (exchange reuse does not cover pre-exchange scans), turning the
    // operator's one-scan claim into two.
    val byStage = docs.select(firstFail.as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val stages = filters.zipWithIndex
      .map { case ((name, _), i) => (i + 1, name) }.toDF("stage", "name")
    val total = byStage.agg(sum(col("n")).as("n_total"))
    // unpartitioned window over |filters| rows — metadata-sized by design
    val w = Window.orderBy(col("stage")).rowsBetween(Window.unboundedPreceding, -1)
    stages.join(byStage, Seq("stage"), "left")
      .select(col("stage"), col("name"),
        coalesce(col("n"), lit(0L)).as("n_dropped"))
      .crossJoin(broadcast(total))
      .withColumn("n_in",
        col("n_total") - coalesce(sum(col("n_dropped")).over(w), lit(0L)))
      .select(col("stage"), col("name"), col("n_in"), col("n_dropped"),
        (col("n_in") - col("n_dropped")).as("n_out"))
  }

  /** Cross-document boilerplate REMOVAL — the rewrite form of
    * [[Dedup.duplicateSpans]] (which only reports): every document is split
    * into aligned `spanTokens`-token chunks (the same chunk/hash basis as
    * X39, so the two operators agree on what a span is), chunks whose hash
    * occurs in ≥ `minDocs` DISTINCT documents are dropped, and each
    * document's text is rebuilt from its surviving chunks in position order
    * plus the unhashed tail fragment (tokens past the last full chunk —
    * never removed, because a partial tail hashes differently per doc
    * length and can't be corpus-matched). This is the C4/RefinedWeb
    * repeated-line scrub reshaped for continuous text.
    *
    * Plan shape: one narrow chunk explode (pinned — it feeds both the
    * frequency aggregate and the rebuild), one span_hash-partitioned
    * aggregate for the boilerplate set, one anti-join on span_hash, and one
    * doc_id-partitioned rebuild aggregate. Nothing is doc×doc; the
    * boilerplate hash set is corpus-derived but output-bounded (hashes
    * appearing ≥ minDocs times), and the rebuild's `array_sort` orders each
    * doc's OWN chunks — bounded by doc length, not corpus size.
    *
    * Output: (doc_id, clean_text, n_spans, n_removed). Docs shorter than one
    * chunk pass through verbatim with n_spans = 0.
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       spanTokens: Int = 8, minDocs: Int = 2): DataFrame = {
    require(spanTokens > 0 && minDocs >= 2,
      "spanTokens must be positive; minDocs below 2 would strip every chunk")
    val base = docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("tk"))
      .withColumn("n_chunks", (size(col("tk")) / spanTokens).cast("int"))
    val chunks = base.where(col("n_chunks") > 0)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), col("n_chunks") - 1),
          i => slice(col("tk"), i * spanTokens + 1, lit(spanTokens)))))
      .select(col("doc_id"), col("pos"), col("col").as("ctk"),
        md5(concat_ws(" ", col("col")).cast("binary")).as("span_hash"))
      .localCheckpoint(eager = false)
    val boiler = chunks.groupBy(col("span_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("span_hash"))
    val kept = chunks.join(boiler, Seq("span_hash"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("ctk")))),
          x => x.getField("ctk"))).as("body"),
        count(lit(1)).as("n_kept"))
    base.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(" ", concat(
          coalesce(col("body"), array().cast("array<string>")),
          slice(col("tk"), col("n_chunks") * spanTokens + 1,
            greatest(size(col("tk")) - col("n_chunks") * spanTokens, lit(0)))))
          .as("clean_text"),
        col("n_chunks").cast("long").as("n_spans"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_removed"))
  }

  /** Concat-and-chunk sequence packing: the pretraining layout that
    * concatenates documents within a pack group and slices the token stream
    * into fixed `chunkTokens` context windows. Emits, per document, its
    * group, token count, start offset in the group's stream, and the first /
    * last chunk ids it lands in (a doc may straddle a chunk boundary — that
    * is the semantics of concat-and-chunk packing).
    *
    * Groups come from a content hash ([[Dedup.md5Hash48]] mod `nGroups`), so
    * the layout is deterministic under any partitioning, cluster size, or
    * engine — the same reproducibility argument as [[Sampling]]. Within a
    * group the stream order is doc_id (stable, total).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    nGroups: Int = 8, chunkTokens: Int = 256): DataFrame = {
    require(nGroups > 0 && chunkTokens > 0, "need positive groups and chunk size")
    val base = docs.select(
      pmod(Dedup.md5Hash48(col(textCol)), lit(nGroups.toLong)).as("pack_group"),
      col(idCol).as("doc_id"),
      TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("pack_group")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .select(col("pack_group"), col("doc_id"), col("n_tokens"),
        (sum(col("n_tokens")).over(w) - col("n_tokens")).as("start_tok"))
      .select(col("pack_group"), col("doc_id"), col("n_tokens"), col("start_tok"),
        floor(col("start_tok") / chunkTokens).cast("long").as("chunk_first"),
        floor((col("start_tok") + greatest(col("n_tokens"), lit(1L)) - 1L) /
          chunkTokens).cast("long").as("chunk_last"))
  }

  /** Train/eval split-leakage screen: aligned `spanTokens`-token span
    * hashes present on BOTH sides of the deterministic id-hash split
    * ([[Sampling.hashSplit]] routes by document ID, so identical or
    * boilerplate-sharing CONTENT legally straddles the boundary) — the
    * leak that n-gram decontamination against an external benchmark
    * ([[contaminationReport]]) cannot see once splits are derived
    * downstream of dedup. The standard QA gate before a training run:
    * nonzero rows mean eval measures memorization of shared passages.
    *
    * Shape: one span explode ([[Dedup.docSpans]] — the X39 hash basis) +
    * ONE span_hash-partitioned aggregate whose conditional distinct counts
    * classify each doc occurrence by its split bucket (a pure function of
    * the id — no second scan, no join); output is leak-sized. Output
    * (span_hash, n_train_docs, n_eval_docs), both ≥ 1 by construction. */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
                   trainPermille: Int = 900, spanTokens: Int = 8): DataFrame = {
    require(trainPermille > 0 && trainPermille < 1000,
      "trainPermille must cut both sides non-empty: (0, 1000)")
    val spans = Dedup.docSpans(docs, idCol, textCol, spanTokens)
      .withColumn("__b",
        pmod(Dedup.md5Hash48(col("id").cast("string")), lit(1000L)))
    spans.groupBy(col("span_hash"))
      .agg(
        countDistinct(when(col("__b") < trainPermille, col("id")))
          .as("n_train_docs"),
        countDistinct(when(col("__b") >= trainPermille, col("id")))
          .as("n_eval_docs"))
      .where(col("n_train_docs") > 0 && col("n_eval_docs") > 0)
  }

  /** Per-group Tukey-fence outlier screen over a numeric column: rows
    * outside [q1 − k·IQR, q3 + k·IQR] of their group's exact interpolated
    * quartiles. The telemetry-curation shape (drop corrupted
    * durations/sizes/scores before they poison training statistics), same
    * plan as [[qualityGate]] generalized to groups: the fence table is
    * |groups| rows → broadcast; the corpus side is ONE narrow filter scan.
    *
    * Fences are doubles, but every term is derived from the same exact
    * percentile both engines compute identically (the `agg_percentile` /
    * `text_quality_gate` precedent), and IEEE ±/× on identical doubles is
    * bit-identical — so the strict-inequality membership is engine-stable.
    * At 100 TB swap the quartiles to `approx_percentile` per the
    * [[qualityGateApprox]] convention (per-group sketches, same fence
    * algebra).
    *
    * Output: original columns + (q_lo, q_hi) fence bounds, outlier rows
    * only. */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 1.5): DataFrame = {
    val fences = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.25)).as("q1"),
        percentile(col(valueCol), lit(0.75)).as("q3"))
      .select(col(groupCol),
        (col("q1") - (col("q3") - col("q1")) * k).as("q_lo"),
        (col("q3") + (col("q3") - col("q1")) * k).as("q_hi"))
    df.join(broadcast(fences), groupCol)
      .where(col(valueCol) < col("q_lo") || col(valueCol) > col("q_hi"))
  }

  /** DAILY-VOLUME ANOMALY SCREEN — the ingest-monitoring twin of
    * [[iqrOutliers]]: flag (group, day) buckets whose event count deviates
    * more than `k` standard deviations from the group's own daily mean.
    * Catches the pipeline failures a corpus ingest actually has (a source
    * that went dark, a crawler loop double-feeding a day) before the data
    * trains anything.
    *
    * The flag is EXACT INTEGER arithmetic end to end — no mean, no sqrt,
    * no doubles: |x − S/n| > k·σ with σ² = (nQ − S²)/n² rewrites to
    *
    *   (x·n − S)² > k²·(n·Q − S²)
    *
    * over counts x, day count n, Σx = S, Σx² = Q — decimal(38,0) products,
    * so the SAME buckets flag in any engine and under any partitioning
    * (the fence-double caveat of [[iqrOutliers]] does not even arise).
    *
    * Shape: one (group, day) count aggregate (map-side combined), one
    * |groups|-row stats aggregate that BROADCASTS back, one narrow flag
    * map. Output: (groupCol, day, n, is_anomaly) for every bucket — the
    * report form; filter `is_anomaly` for the alert form. */
  def dailyVolumeAnomalies(events: DataFrame, groupCol: String,
                           tsCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "k >= 1")
    val daily = events
      .groupBy(col(groupCol),
        expr(s"unix_micros($tsCol) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col(groupCol))
      .agg(count(lit(1)).as("nd"),
        sum(col("n")).as("s"),
        sum(expr("n * n")).as("q"))
    daily.join(broadcast(stats), groupCol :: Nil)
      .withColumn("is_anomaly", expr(
        s"""cast(n * nd - s AS decimal(38,0)) * cast(n * nd - s AS decimal(38,0))
           | > ${k.toLong * k} * (cast(nd AS decimal(38,0)) * q
           |                      - cast(s AS decimal(38,0)) * s)""".stripMargin))
      .select(col(groupCol), col("day"), col("n"), col("is_anomaly"))
  }

  /** COMPOSITION-DRIFT report between two corpus snapshots (old vs new
    * crawl, train vs holdout, yesterday vs today): per stratum, each side's
    * share in exact integer basis points and the absolute share delta —
    * Σ delta_bp/2 over the output is total-variation distance ×10⁴, the
    * drift metric that needs no libm log (the PSI log-ratio term is
    * last-ulp engine-dependent; TVD is exact and bounds it). Side
    * membership is any boolean column expression, so the two snapshots can
    * be halves of one table (id parity), a date split, or a version column.
    *
    * Shape: ONE pass — a |strata|-row conditional-count aggregate (map-side
    * combined), totals back as a 1-row scalar struct, a narrow share map.
    * The corpus is never shuffled. Strata missing from one side report
    * share 0 there — exactly the rows a drift monitor cares about. An
    * entirely EMPTY side (comparing against an empty snapshot) likewise
    * reports every share on that side as 0 rather than integer-div nulls:
    * the report then reads "everything is new/gone", never all-null. */
  def distributionDrift(df: DataFrame, strataCol: String,
                        isSideA: Column): DataFrame = {
    val agg = df.groupBy(col(strataCol))
      .agg(sum(when(isSideA, 1L).otherwise(0L)).as("n_a"),
        sum(when(isSideA, 0L).otherwise(1L)).as("n_b"))
      .localCheckpoint(eager = false) // feeds the totals AND the share map
    val tot = agg.agg(struct(sum(col("n_a")).as("t_a"),
      sum(col("n_b")).as("t_b")).as("s"))
    agg.withColumn("__t", tot.scalar())
      .select(col(strataCol), col("n_a"), col("n_b"),
        expr("CASE WHEN __t.t_a = 0 THEN 0 ELSE n_a * 10000 div __t.t_a END").as("p_bp"),
        expr("CASE WHEN __t.t_b = 0 THEN 0 ELSE n_b * 10000 div __t.t_b END").as("q_bp"))
      .withColumn("delta_bp", abs(col("p_bp") - col("q_bp")))
  }
}
