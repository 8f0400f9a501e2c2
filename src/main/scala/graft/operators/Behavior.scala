package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product analytics over event streams: cohort retention,
  * ordered conversion funnels, session trajectory extraction, and validity-
  * interval (SCD2-style) state timelines. These are the event-side twins of
  * the corpus-observability reports ([[Curation]]'s composition/histogram
  * family): the reference's MovieLens pipelines aggregate static facts; a
  * production event store asks the longitudinal questions below.
  *
  * Scale shape, per operator (100 TB event logs, billions of users):
  *   - [[retention]]: two hash aggregates and one equi-join, ALL keyed on the
  *     user id — the exchanges co-partition, so the fact table is shuffled
  *     once on user and the (cohort, offset) matrix aggregate carries one row
  *     per (user, bucket), already distinct (no countDistinct re-expansion).
  *   - [[funnel]]: per-step frames shrink monotonically (step i+1 ⊆ step i);
  *     every join and aggregate is keyed on the user id, so a cluster keeps
  *     one partitioning across all stages. Each stage is lazily pinned
  *     (localCheckpoint) so the k 1-row step counts don't re-execute the
  *     whole prefix chain k times.
  *   - [[sessionTrajectories]]: one session_window aggregate (state bounded
  *     by the idle gap — identical machinery to the sessionize queries) whose
  *     per-session buffer is the trace itself, then a path-keyed count
  *     aggregate with map-side combine. Traces are bounded by session length,
  *     never by user lifetime.
  *   - [[stateTimeline]]: one user-partitioned window pass computing
  *     run-length state starts (lag) and interval ends (lead over starts) —
  *     per-group state is a single row of look-back/look-ahead, not the
  *     user's history.
  */
object Behavior {

  /** Cohort retention matrix: bucket time by `bucketUs`-microsecond epochs
    * (86400e6 = daily cohorts, 7·86400e6 = weekly), assign each entity to the
    * cohort of its FIRST active bucket, and count entities active at each
    * (cohort, offset). Output: cohort_bucket, bucket_offset, n_users —
    * the classic triangular retention matrix.
    *
    * Integer epoch-division buckets (not calendar truncation) keep the
    * bucket boundary engine-portable: `unix_micros div bucketUs` is the same
    * integer everywhere, while week-truncation start-of-week conventions
    * vary across engines. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                bucketUs: Long = 86400000000L): DataFrame = {
    val act = events
      .select(col(userCol).as("user"),
        // cast first: unix_micros rejects TIMESTAMP_NTZ inputs, and the
        // session zone is pinned UTC (Tuning.tune) so the cast is stable
        expr(s"unix_micros(cast($tsCol AS timestamp)) div ${bucketUs}L")
          .as("bucket"))
      .distinct()
    val first = act.groupBy(col("user")).agg(min(col("bucket")).as("cohort_bucket"))
    // act is distinct per (user, bucket), so count(*) IS distinct users.
    act.join(first, "user")
      .groupBy(col("cohort_bucket"),
        (col("bucket") - col("cohort_bucket")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered conversion funnel: for each entity, step i+1 counts only if an
    * event of its type occurs AT OR AFTER the entity's earliest qualifying
    * time for step i (the strict-sequence funnel — a purchase before the
    * first view does not convert). Output: (step_idx, step, n_users), one
    * row per step, n_users monotonically non-increasing.
    *
    * Each stage is `min(ts)` per user of the step's events filtered by the
    * previous stage's time — the standard sequential-min formulation; ties
    * at the same timestamp count (>=), matching the at-or-after reading. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("user"), col(tsCol).as("ts"),
      col(typeCol).as("typ"))
    var reached = ev.where(col("typ") === steps.head)
      .groupBy(col("user")).agg(min(col("ts")).as("t"))
      .localCheckpoint(eager = false)
    var frames = Vector(reached)
    for (s <- steps.tail) {
      reached = ev.where(col("typ") === s)
        .join(reached, "user")
        .where(col("ts") >= col("t"))
        .groupBy(col("user")).agg(min(col("ts")).as("t"))
        .localCheckpoint(eager = false)
      frames :+= reached
    }
    frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(steps(i)).as("step"),
          col("n_users"))
    }.reduce(_ union _)
  }

  /** Session trajectory mining: gap-sessionize (idle > `gap` closes a
    * session), render each session as its ordered event-type path
    * ("signup>view>click"), and count sessions per distinct path — the
    * input both behavioral-sequence training corpora and UX funnel
    * discovery read. Output: (path, n_sessions).
    *
    * The per-session trace is collected INSIDE the session_window aggregate
    * and sorted by (ts, tie) — array_sort on the struct gives the total
    * (ts, tie, state) order, so the rendered path is deterministic under
    * any partitioning. */
  def sessionTrajectories(events: DataFrame, userCol: String, tsCol: String,
                          tieCol: String, typeCol: String,
                          gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(tsCol).as("t"),
            col(tieCol).as("i"), col(typeCol).as("s")))),
          x => x.getField("s")),
        ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))

  /** Validity-interval state timeline (the SCD2 build): collapse each
    * entity's consecutive runs of the same state into one row with
    * [valid_from, valid_to) bounds — valid_to is the NEXT run's start, null
    * for the current (open) state. Output: user, state, valid_from,
    * valid_to, n_events (run length).
    *
    * One window pass marks run starts (state ≠ lag(state)); a second window
    * over the run-start rows alone takes lead(start) as the interval end.
    * This is the changelog→temporal-table primitive: applied to a 100 TB
    * attribute-change log it emits the slowly-changing dimension a
    * point-in-time join ([[Temporal.asofJoin]]) then serves. */
  def stateTimeline(events: DataFrame, userCol: String, tsCol: String,
                    tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col("user")).orderBy(col("ts"), col("tie"))
    val runs = events
      .select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("state"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .withColumn("run_start",
        when(col("prev").isNull || col("prev") =!= col("state"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("run_start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perRun = runs.groupBy(col("user"), col("run_id"))
      .agg(min(col("state")).as("state"), min(col("ts")).as("valid_from"),
        min(col("tie")).as("tie0"), count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col("user"))
      .orderBy(col("valid_from"), col("tie0"))
    perRun
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      // tie0 (the run's first tie value — e.g. its first event id) rides
      // along as a unique-within-user order key AND a lineage pointer.
      .select(col("user"), col("state"), col("valid_from"), col("valid_to"),
        col("n_events"), col("tie0"))
  }
}
