package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}

/** End-to-end training-corpus curation: the library's operators composed in
  * the canonical pipeline order a pretraining data job runs —
  *
  *   scrub → boilerplate strip → quality gate → exact dedup →
  *   near-dedup survivors → benchmark decontamination → sequence packing
  *
  * [[curate]] is ONE lazy DataFrame program: no stage runs anything by
  * itself, so Catalyst sees the whole pipeline (column pruning reaches the
  * scan through every stage, and the semi-joins that implement "keep the
  * survivors" are planned with runtime statistics under AQE). At corpus
  * scale each keep-list is small relative to the corpus, so those joins
  * broadcast; the only corpus-wide shuffles are the ones the individual
  * operators already document (dedup key agg, LSH bands, pack-group
  * window). Two caveats to the one-program framing: exchange reuse does NOT
  * cover pre-exchange scans, so the two lineages a stage fans out into
  * (`exact` feeds both the LSH pair join and the survivor join; `clean`
  * feeds both the pack layout and the final join) would re-execute their
  * whole upstream subtree per branch — those two frames are pinned with a
  * LAZY localCheckpoint (first action materializes, laziness preserved;
  * same discipline as the operators' own shingle/pair pinning). At 1000
  * executors swap for `checkpoint()` against the cluster filesystem if
  * executor loss matters more than the write round-trip.
  *
  * The benchmark rows (`benchPred`) are held OUT of the curated corpus and
  * define the decontamination reference — both sides scrubbed first, so
  * n-gram overlap is measured on the text a model would actually train on.
  *
  * Usage: runMain graft.examples.CurationPipelineDemo [sfDir] [outDir]
  */
object CurationPipelineDemo {

  /** The composed pipeline. Input must have (doc_id, text); returns the
    * curated corpus with its pack layout: (doc_id, text, pack_group,
    * n_tokens, start_tok, chunk_first, chunk_last). */
  def curate(docs: DataFrame,
             blocklist: Seq[String] = Seq("spark", "stream"),
             benchPred: Column = col("doc_id") % 11 === 0,
             qualityQ: Double = 0.25,
             contaminationMaxBp: Long = 2000L,
             nGroups: Int = 8, chunkTokens: Int = 256): DataFrame = {
    // 1. scrub in place — every later stage sees the redacted corpus
    val scrubbed = docs.select(col("doc_id"), benchPred.as("is_bench"),
      Curation.scrubText(col("text"), blocklist).as("text"))
    val bench = scrubbed.where(col("is_bench")).select("doc_id", "text")
    val train0 = scrubbed.where(!col("is_bench")).select("doc_id", "text")

    // 1b. strip cross-doc boilerplate spans — every later signal (quality,
    // dedup, decontamination) then measures CONTENT, not shared chrome.
    // Pinned: the stripped corpus feeds the gate's threshold pass AND the
    // gated semi-join (the same fan-out rationale as `exact`/`clean`).
    val train = Curation.stripBoilerplate(train0, "doc_id", "text")
      .select(col("doc_id"), col("clean_text").as("text"))
      .localCheckpoint(eager = false)

    // 2. quality gate: drop the bottom quality quantile
    val gated = train.join(
      Curation.qualityGate(train, "doc_id", "text", qualityQ).select("doc_id"),
      Seq("doc_id"), "left_semi")

    // 3. exact dedup (full-text key, min-id survivor) — pinned: both the
    // LSH pair derivation and the survivor join below read it
    val exact = Dedup.exact(gated, Seq("text"), "doc_id")
      .localCheckpoint(eager = false)

    // 4. near-dedup: at-scale MinHash-LSH pairs → component survivors
    val survivors = Dedup.nearDedupSurvivorsFromPairs(exact, "doc_id",
      Dedup.minHashLsh(exact, "doc_id", "text"))
    val deduped = exact.join(survivors, Seq("doc_id"), "left_semi")

    // 5. decontamination: drop docs overlapping the held-out benchmark
    val report = Curation.contaminationReport(
      bench.withColumn("is_bench", lit(true))
        .unionByName(deduped.withColumn("is_bench", lit(false))),
      "doc_id", "text", benchPred = col("is_bench"))
    // pinned: the pack layout and the final join both read `clean`
    val clean = deduped.join(
      report.where(col("contamination_bp") <= contaminationMaxBp).select("doc_id"),
      Seq("doc_id"), "left_semi")
      .localCheckpoint(eager = false)

    // 6. pack into fixed context windows
    clean.join(
      Curation.packSequences(clean, "doc_id", "text", nGroups, chunkTokens),
      Seq("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("curation-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.engine.Sources.documents(spark, sfDir)
    val curated = curate(docs)
    println(s"input docs:   ${docs.count()}")
    println(s"curated docs: ${curated.count()}")
    curated.orderBy("pack_group", "start_tok").show(10, truncate = 60)
    args.lift(1).foreach { out =>
      curated.write.mode("overwrite").partitionBy("pack_group").parquet(out)
      println(s"wrote curated shards to $out (partitioned by pack_group)")
    }
    spark.stop()
  }
}
