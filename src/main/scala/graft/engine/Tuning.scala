package graft.engine

import org.apache.spark.sql.SparkSession

/** Runtime session tuning. The driver owns the SparkSession builder
  * (Bench/Verify mains), so scale knobs are applied via runtime conf on first
  * query build. Idempotent.
  *
  * 100 TB rationale: AQE re-plans at runtime (coalesces post-shuffle
  * partitions sized by `advisoryPartitionSizeInBytes`, splits skewed join
  * partitions, demotes sort-merge to broadcast when a side turns out small);
  * the explicit 64 MB broadcast threshold keeps dimension joins shuffle-free
  * without risking driver OOM on a genuinely large build side.
  */
object Tuning {
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    // UTC everywhere queries run: TIMESTAMP_NTZ→TIMESTAMP casts and
    // date_format() are session-timezone-dependent; the oracle compare
    // assumes UTC wall-clock strings (Verify pins it too — this covers
    // Bench and ad-hoc sessions).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
