package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** As-of join semantics on hand-built frames: boundary inclusion, strict
  * mode, per-key isolation, no-match nulls, latest-wins, and the plan shape
  * (window-based — no join operator at all, so no range-join explosion). */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def left = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 15L), (5L, "c", 9L))
    .toDF("id", "k", "t")
  private def right = Seq(
    ("a", 10L, 1.0), ("a", 12L, 2.0), ("a", 3L, 3.0), ("b", 15L, 4.0), ("b", 1L, 5.0))
    .toDF("k", "t", "v")

  test("asofJoin: latest t' <= t per key; misses yield nulls") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(1.0)),  // t=10 matches right t'=10 (boundary inclusive)
      (2L, Some(2.0)),  // t=20 matches latest t'=12, not t'=10 or 3
      (3L, Some(3.0)),  // t=5 matches t'=3
      (4L, Some(4.0)),  // key b, boundary t'=15
      (5L, None)))      // key c has no right rows
  }

  test("asofJoin strict: equal timestamps do NOT match") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"), strict = true)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(3.0)),  // t=10 strict: t'=10 excluded -> t'=3
      (2L, Some(2.0)),
      (3L, Some(3.0)),
      (4L, Some(5.0)),  // t=15 strict: t'=15 excluded -> t'=1
      (5L, None)))
  }

  test("asofJoinWithin: stale matches beyond the tolerance null out") {
    val l = Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val r = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 7.0))
      .toDF("k", "t", "v")
    val within = Temporal.asofJoinWithin(l, r, Seq("k"), "t", "t", Seq("v"), "90 MINUTE")
      .collect()(0)
    assert(within.isNullAt(3) && within.isNullAt(4), "2h-old match must be nulled at 90m tolerance")
    val loose = Temporal.asofJoinWithin(l, r, Seq("k"), "t", "t", Seq("v"), "3 HOUR")
      .collect()(0)
    assert(loose.getDouble(4) == 7.0)
  }

  test("timeBandJoin: inclusive boundaries, key isolation, no duplicate matches") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "b", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val r = Seq(
      ("a", ts("2024-01-01 09:30:00"), 1.0), // exactly at lookback boundary -> in
      ("a", ts("2024-01-01 09:29:59"), 2.0), // one second too old -> out
      ("a", ts("2024-01-01 10:00:00"), 3.0), // equal time, lookahead 0 -> in
      ("a", ts("2024-01-01 10:00:01"), 4.0), // future -> out
      ("b", ts("2024-01-01 09:45:00"), 5.0), // other key
      ("c", ts("2024-01-01 09:45:00"), 6.0)).toDF("k", "t", "v")
    val out = Temporal.timeBandJoin(l, r, Seq("k"), "t", "t",
      lookbackSec = 1800L, lookaheadSec = 0L)
    val got = out.collect().map(x => (x.getLong(0), x.getDouble(5))).toSeq.sorted
    assert(got == Seq((1L, 1.0), (1L, 3.0), (2L, 5.0)),
      s"got $got")
    // each qualifying pair appears exactly once despite the 3-bucket explode
    assert(got.distinct.size == got.size)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"banded range join must not plan as a theta join:\n$plan")
  }

  test("asofJoin plans as window over union — no join operator, no explosion") {
    val df = Temporal.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"), s"expected window-based plan:\n$plan")
  }
}
