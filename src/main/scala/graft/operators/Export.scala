package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard EXPORT — the last step of the curation pipeline: the
  * curated corpus leaves Spark as a fixed set of shard files a training
  * loader consumes (the webdataset/TFRecord sharding shape), plus a
  * MANIFEST table describing exactly what each shard holds. Two invariants
  * make this usable at 100 TB:
  *
  *  - **Deterministic assignment**: shard = md5-48(id) mod nShards — a
  *    content-addressed rule, not a partition accident, so re-running the
  *    export reproduces byte-identical shard membership and any engine
  *    (or the oracle) can recompute which shard a doc belongs to.
  *  - **Verified manifest**: the manifest is built by READING BACK the
  *    written files (counts, token totals, and an order-independent
  *    content fingerprint recomputed from the stored bytes), and
  *    [[auditShards]] re-derives all three from disk and compares — a
  *    training run can prove its input shards are exactly the curated
  *    corpus before spending GPU-hours on them.
  *
  * Plan shape: one narrow scan computes tokens/fingerprint/shard, one
  * hash-repartition on the shard key lands each shard wholly in one task
  * (exactly one file per shard directory — the [[Layout.compact]]
  * discipline), and manifest + audit are single hash aggregates over the
  * shard layout. No global sort, no driver materialization.
  *
  * Reference analog: the job-output contract of the reference's pipeline
  * (README.md:15 "filtering" feeding downstream consumers) — here the
  * consumer is a training loader, so the contract carries counts and a
  * checksum instead of just part files.
  */
object Export {

  private def fingerprint(id: org.apache.spark.sql.Column,
                          text: org.apache.spark.sql.Column) =
    Dedup.md5Hash48(concat(id.cast("string"), lit(":"), text))

  /** Write `docs` as `nShards` training shards under `outDir/shards`
    * (partition dirs `shard=N`, one parquet file each, columns
    * id/text/n_tokens) and the read-back-derived manifest under
    * `outDir/manifest` (shard, n_docs, n_tokens, fingerprint). The
    * fingerprint is the 48-bit-hash XOR fold over `id:text` —
    * order-independent (shard files may be written in any row order),
    * OVERFLOW-FREE at any shard size (a sum of 48-bit values crosses
    * Long.MaxValue at ~65k docs per shard — an ANSI-mode crash, or a
    * silent Spark-wrap vs DuckDB-HUGEINT divergence), and recomputable by
    * any engine. Rows are id-distinct by the pipeline's dedup contract, so
    * XOR pair-cancellation cannot collide distinct shard contents. */
  def writeShards(docs: DataFrame, idCol: String, textCol: String,
                  nShards: Int, outDir: String): Unit = {
    require(nShards > 0, "nShards must be positive")
    val spark = docs.sparkSession
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
      .withColumn("shard",
        pmod(Dedup.md5Hash48(col("id").cast("string")), lit(nShards.toLong)))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(s"$outDir/shards")
    // the manifest describes what is ON DISK, not what we meant to write:
    // built from the read-back, fingerprint recomputed from stored bytes
    spark.read.parquet(s"$outDir/shards")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        bit_xor(fingerprint(col("id"), col("text"))).as("fingerprint"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
  }

  /** Re-derive every manifest quantity from the shard files (token counts
    * recomputed from text, not the stored column; fingerprint recomputed
    * from stored bytes) and compare per shard — full-outer, so a missing
    * or extra shard directory surfaces as a row, never silently. Output:
    * (shard, n_docs, n_tokens, fingerprint, manifest_match). */
  def auditShards(spark: SparkSession, outDir: String): DataFrame = {
    val onDisk = spark.read.parquet(s"$outDir/shards")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"),
        bit_xor(fingerprint(col("id"), col("text"))).as("fingerprint"))
    val manifest = spark.read.parquet(s"$outDir/manifest")
      .select(col("shard"), col("n_docs").as("m_docs"),
        col("n_tokens").as("m_tokens"), col("fingerprint").as("m_fp"))
    onDisk.join(manifest, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("fingerprint"),
        // a shard missing from either side (null comparisons) is a
        // mismatch, never a silent null
        coalesce(col("n_docs") === col("m_docs") &&
          col("n_tokens") === col("m_tokens") &&
          col("fingerprint") === col("m_fp"), lit(false)).as("manifest_match"))
  }
}
