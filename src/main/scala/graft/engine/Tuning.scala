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

  /** Clone a session with the PARENT'S runtime SQL conf: `newSession()`
    * initializes from the context defaults, silently dropping runtime
    * settings (shuffle parallelism, timezone, tuning knobs) — callers that
    * scope a conf override to a child session must inherit first. Static
    * (non-modifiable) confs throw on set and are skipped; only non-fatal
    * failures are swallowed. */
  def cloneWithRuntimeConf(parent: SparkSession): SparkSession = {
    val c = parent.newSession()
    parent.conf.getAll.foreach { case (k, v) =>
      try c.conf.set(k, v)
      catch { case scala.util.control.NonFatal(_) => () } // static confs
    }
    c
  }

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
