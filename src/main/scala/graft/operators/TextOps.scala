package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for a large-scale training-data pipeline,
  * over a `text` string column. All pure `Column` expressions (codegen'd
  * higher-order functions — no UDFs, so whole-stage codegen spans survive;
  * at 100 TB each of these is a single narrow map over the corpus with no
  * shuffle).
  *
  * The DuckDB-oracle twins of each expression live in
  * [[graft.queries.TextQueries]]; expression semantics are chosen to be
  * reproducible in ANSI-ish SQL (regexp token split, md5 fingerprint).
  */
object TextOps {

  /** Whitespace tokenization. Empty input → empty array (not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** BPE-ish regex tokenization: runs of letters, runs of digits, or runs of
    * other non-space symbols, each with an optional leading space — the
    * GPT-2-style pretokenizer shape, minus the library. */
  val bpeishPattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeishPattern), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))
  def uniqueTokenCount(text: Column): Column = size(array_distinct(tokens(text)))
  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Mean token length, 4-decimal rounded; 0.0 for empty docs. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    val totalLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    when(size(toks) === 0, lit(0.0))
      .otherwise(round(totalLen.cast("double") / size(toks), 4))
  }

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      round(length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") / length(text), 4))

  /** Default stopword list used by quality scoring / language ID. */
  val englishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Occurrences of `words` members in a token array — native codegen
    * expression ([[graft.functions.CountInSet]]); [[countInSetHof]] is the
    * interpreted executable spec. */
  def countInSet(toks: Column, words: Seq[String]): Column =
    graft.functions.CountInSet.countInSetNative(toks, words)

  /** HOF reference form of [[countInSet]] (kept for differential tests). */
  def countInSetHof(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Fraction of tokens that are stopwords (quality signal: natural prose
    * sits around 0.3-0.5; keyword-stuffed or tabular text near 0). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val toks = tokens(text)
    val hits = countInSet(toks, stopwords)
    when(size(toks) === 0, lit(0.0))
      .otherwise(round(hits.cast("double") / size(toks), 4))
  }

  /** Composite quality score in [0,1]: weighted blend of length band,
    * stopword presence and low punctuation noise — the usual cheap
    * pretraining-corpus heuristic (length/punct/stopword ratios).
    *
    * Computed entirely in integer basis points (0..10000 per component,
    * weights 4/3/3) with ONE final division — decimal `round()` on a blended
    * double is engine-dependent at exact .xxxx5 boundaries (Spark rounds the
    * binary double exactly via BigDecimal; DuckDB multiplies by 1e4 first),
    * while floor-div on exact integers is bit-identical everywhere. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val hits = countInSet(toks, englishStopwords).cast("long")
    val len = length(text).cast("long")
    val punctChars = length(regexp_replace(text, "[^.,!?;:]", "")).cast("long")
    val lenBp = least(len * 20L, lit(10000L))
    val swBp = when(size(toks) === 0, lit(0L))
      .otherwise(least(floor(hits * 50000L / size(toks)).cast("long"), lit(10000L)))
    val punctBp = greatest(
      lit(10000L) - floor(punctChars * 100000L / len).cast("long"), lit(0L))
    when(len === 0, lit(0.0))
      .otherwise((lenBp * 4L + swBp * 3L + punctBp * 3L).cast("double") / 100000.0)
  }

  /** Per-language discriminator token profiles for heuristic language ID.
    * Real corpora would use char n-gram profiles; the principle — score
    * against per-language token sets, argmax with a deterministic tie order —
    * is identical and SQL-reproducible. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "es", "que", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "que", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Heuristic language ID: count token hits per language profile, take the
    * language with the highest count; ties (including all-zero) resolve to
    * the lexicographically first language — fully deterministic. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langProfiles.map { case (lang, words) =>
      struct(countInSet(toks, words).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max score, then max lang — invert the
    // lang for asc tie-break by comparing on (score, negated-rank) instead:
    // simpler: reduce with an explicit comparison keeping first-wins on ties.
    scored.reduceLeft { (best, cand) =>
      when(cand.getField("score") > best.getField("score"), cand).otherwise(best)
    }.getField("lang")
  }

  /** Content fingerprint: md5 hex of the raw text — exact-dup grouping key
    * that both engines compute identically. */
  def fingerprintMd5(text: Column): Column = md5(text.cast("binary"))

  /** Karp-Rabin-style rolling polynomial fingerprint over characters:
    * fold(acc * 31 + codepoint(char)) mod 1e9+7. Order-sensitive (anagram
    * docs get distinct prints, unlike bag-of-chars) and cheap; expressed
    * with codegen'd higher-order functions. */
  def fingerprintRolling(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * 31L + ascii(c).cast("long")) % 1000000007L)
}
