package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** Behavioral-analytics invariants: retention matrix identities, funnel
  * monotonicity + ordering semantics, trajectory/session consistency, and
  * the timeline's interval-partition laws. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def events = graft.engine.Sources.events(spark, dir)

  test("retention: offset-0 diagonal counts each cohort's users exactly once") {
    val m = Behavior.retention(events, "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.nonEmpty)
    // every (cohort, 0) cell equals the cohort size (all users active on
    // their first bucket by definition), and no offset is negative
    val diag = m.filter(_._2 == 0L).map(x => x._1 -> x._3).toMap
    val cohortSizes = events
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("b"))
      .groupBy("user_id").agg(min("b").as("c"))
      .groupBy("c").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(diag == cohortSizes, "offset-0 column must equal cohort sizes")
    assert(m.forall(_._2 >= 0L), "offsets are non-negative by construction")
    // retained never exceeds the cohort size at any offset
    assert(m.forall { case (c, _, n) => n <= cohortSizes(c) })
  }

  test("funnel: counts are monotone non-increasing and order-sensitive") {
    val steps = Seq("signup", "view", "click", "purchase")
    val n = Behavior.funnel(events, "user_id", "ts", "event_type", steps)
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(n.length == 4 && n.head > 0)
    assert(n.sliding(2).forall(p => p(0) >= p(1)), s"monotone: ${n.toSeq}")
    // sequencing matters: the ordered count is ≤ the unordered
    // users-who-did-all-steps count
    val unordered = events.where(col("event_type").isin(steps: _*))
      .groupBy("user_id").agg(countDistinct("event_type").as("k"))
      .where(col("k") === steps.size).count()
    assert(n.last <= unordered)
  }

  test("session paths: session totals match the sessionize aggregate") {
    val paths = Behavior.sessionTrajectories(
      events, "user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nSessions = paths.map(_._2).sum
    val nSessionize = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().count()
    assert(nSessions == nSessionize, "path counts must partition sessions")
    // total steps across paths = total events (every event is in a path)
    val nSteps = paths.map { case (p, n) => (p.count(_ == '>') + 1) * n }.sum
    assert(nSteps == events.count())
  }

  test("timeline: intervals partition each user's history, runs alternate") {
    val tl = Behavior.stateTimeline(events, "user_id", "ts", "event_id",
      "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(3)), r.getTimestamp(2), r.getLong(4)))
    // run lengths sum to the event count
    assert(tl.map(_._5).sum == events.count())
    val byUser = tl.groupBy(_._1)
    byUser.values.foreach { rows =>
      val sorted = rows.sortBy(_._4.getTime)
      // exactly one open interval per user, and it is the last one
      assert(sorted.count(_._3.isEmpty) == 1 && sorted.last._3.isEmpty)
      // each interval's end = the next interval's start; states alternate
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a._3.contains(b._4), "valid_to must chain to next valid_from")
        assert(a._2 != b._2, "consecutive runs must differ in state")
      }
    }
  }
}
