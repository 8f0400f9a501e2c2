package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators.
  *
  * [[asofJoin]] is the classic time-series enrichment: for every left row
  * (keys, t), attach the LATEST right row (keys, t') with t' ≤ t (or t' < t
  * in strict mode) — "price as of trade time", "last view before purchase".
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
  * composition — `l.join(r, keys && r.t <= l.t)` then max-per-left-row — is
  * a range join: Catalyst plans the inequality as a broadcast nested loop /
  * per-pair filter whose intermediate is |matches| ≈ |L|·|R per key| rows
  * BEFORE the max prunes it. The scale-correct form used here is
  * union-then-window:
  *
  *   1. tag both inputs and union them (narrow, no shuffle yet),
  *   2. one hash-shuffle on the keys, one per-partition sort on
  *      (t, side, payload),
  *   3. a running `last(right_payload, ignoreNulls)` over the ordered
  *      stream — each left row reads the latest right payload at or before
  *      it in O(1),
  *   4. keep the left rows.
  *
  * One shuffle + one sort total, intermediate size |L| + |R|, no pair
  * explosion — survives 100 TB as long as single keys fit a partition (the
  * same contract as any window; salt the key externally if one entity owns
  * billions of rows).
  *
  * Determinism: right rows tie-broken by (t', payload struct) order, so two
  * right rows at the same timestamp resolve identically every run/engine.
  */
object Temporal {

  /** NULL-key note: the window partitions NULL keys into one group (GROUP
    * BY semantics), so a null-keyed left row CAN match a null-keyed right
    * row — unlike a SQL equi-join (and DuckDB's ASOF JOIN), where NULL never
    * equals NULL. Pre-filter null keys if SQL-join semantics are required.
    *
    * @param left       rows to enrich (all columns preserved in the output)
    * @param right      lookup stream
    * @param keyCols    equi-key columns present in BOTH inputs
    * @param leftTime   event-time column in `left`
    * @param rightTime  event-time column in `right`
    * @param rightVals  right columns to attach; emitted as `asof_<name>`,
    *                   plus `asof_<rightTime>` for the matched timestamp —
    *                   all null when no right row precedes the left row
    * @param strict     false (default): match t' ≤ t; true: t' < t  */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String, rightVals: Seq[String],
               strict: Boolean = false): DataFrame = {
    val rightPayloadCols = rightTime +: rightVals
    val rStructType = StructType(rightPayloadCols.map(c =>
      right.schema(c).copy(name = c)))
    val lStructType = StructType(left.schema.fields)

    // Sides order right rows BEFORE left rows at equal time for t' ≤ t
    // semantics, AFTER them for strict t' < t — the running last() window
    // ends at the current row, so placement alone fixes the boundary rule.
    val rightSide = if (strict) 2 else 0

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rStructType).as("__r")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(rightSide).as("__side"),
        lit(null).cast(lStructType).as("__l"),
        struct(rightPayloadCols.map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        left.columns.map(c => col(s"__l.$c").as(c)) ++
          rightPayloadCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Time-band (range) join: all (left, right) pairs with equal keys and
    * `rightTime` within `[leftTime - lookback, leftTime + lookahead]`.
    *
    * Spark plans a raw time-inequality join as a broadcast nested loop (a
    * theta join) — dead at fact×fact scale. Here the band is turned into an
    * EQUI key by time bucketing: bucket width = band span, left rows keep
    * their bucket, right rows explode into {b-1, b, b+1} (any in-band pair
    * differs by < one bucket width, so it must land in the same or an
    * adjacent bucket — recall 1.0 by construction), then the exact band
    * predicate filters inside the join condition. Each right row is
    * replicated exactly 3×, independent of data size — a shuffled hash join
    * with bounded fan-out, the standard interval-join layout (Flink's
    * interval join uses the same keyed time-bucket state shape).
    *
    * Times are compared at microsecond precision (long epoch micros);
    * lookback/lookahead are non-negative second counts. */
  def timeBandJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTime: String, rightTime: String,
                   lookbackSec: Long, lookaheadSec: Long = 0L): DataFrame = {
    require(lookbackSec >= 0 && lookaheadSec >= 0,
      "lookback/lookahead must be non-negative")
    val spanUs = (lookbackSec + lookaheadSec).max(1L) * 1000000L
    val lUs = unix_micros(col(s"l.$leftTime"))
    val rUs = unix_micros(col(s"r.$rightTime"))
    val l = left.withColumn("__bkt", floor(unix_micros(col(leftTime)) / spanUs)).as("l")
    val r = right
      .withColumn("__bkt0", floor(unix_micros(col(rightTime)) / spanUs))
      .select(col("*"), explode(array(col("__bkt0") - 1, col("__bkt0"), col("__bkt0") + 1)).as("__bkt"))
      .drop("__bkt0").as("r")
    val keyCond = keyCols.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val band = rUs >= lUs - lit(lookbackSec * 1000000L) &&
      rUs <= lUs + lit(lookaheadSec * 1000000L)
    l.join(r.hint("shuffle_hash"),
        keyCond && col("l.__bkt") === col("r.__bkt") && band)
      .select(
        left.columns.map(c => col(s"l.$c").as(c)) ++
          right.columns.map(c => col(s"r.$c").as(s"r_$c")): _*)
  }

  /** Convenience: [[asofJoin]] bounded by a max lookback — matches older
    * than `tolerance` from the left time are nulled out (the "stale quote"
    * guard). Applied as a post-filter on the matched timestamp, so the
    * plan shape is unchanged. */
  def asofJoinWithin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                     leftTime: String, rightTime: String,
                     rightVals: Seq[String], tolerance: String,
                     strict: Boolean = false): DataFrame = {
    val joined = asofJoin(left, right, keyCols, leftTime, rightTime, rightVals, strict)
    val fresh = col(s"asof_$rightTime") >=
      col(leftTime) - expr(s"INTERVAL $tolerance")
    val outCols = left.columns.map(col) ++ (rightTime +: rightVals).map(c =>
      when(fresh, col(s"asof_$c")).otherwise(lit(null)).as(s"asof_$c"))
    joined.select(outCols: _*)
  }
}
