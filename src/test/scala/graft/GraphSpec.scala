package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Weighted-graph iteration guarantees: transition edges match a hand
  * trace, the fixed-point PageRank is partitioning-invariant (the property
  * double-precision power iteration lacks), mass stays bounded by the
  * scale, and ranking order matches intuition on a known graph. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def events = Seq(
    // user 1: a -> b -> c
    (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "c"),
    // user 2: a -> b -> b
    (2L, 4L, 10L, "a"), (2L, 5L, 20L, "b"), (2L, 6L, 30L, "b"),
    // user 3: c alone (no edges)
    (3L, 7L, 10L, "c")
  ).toDF("user_id", "event_id", "ts", "event_type")

  private def edges =
    Graph.transitionEdges(events, "user_id",
      Seq(col("ts"), col("event_id")), "event_type")

  test("transitionEdges: per-user successor pairs with counts") {
    val got = edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 2L), ("b", "c", 1L), ("b", "b", 1L)))
  }

  test("transitionEdges: ties broken by event_id, singleton traces dropped") {
    val tied = Seq((9L, 1L, 5L, "x"), (9L, 2L, 5L, "y"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Graph.transitionEdges(tied, "user_id",
      Seq(col("ts"), col("event_id")), "event_type").collect()
    assert(got.length == 1 && got(0).getString(0) == "x"
      && got(0).getString(1) == "y")
  }

  test("transitionMatrix: integer basis points floor to the row sum") {
    val got = Graph.transitionMatrix(edges).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    // a: all mass to b; b: 1/2 each to b and c
    assert(got(("a", "b")) == 10000L)
    assert(got(("b", "b")) == 5000L && got(("b", "c")) == 5000L)
  }

  test("pageRank: exact fixed-point is partitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(Graph.transitionEdges(df, "user_id",
        Seq(col("ts"), col("event_id")), "event_type"), iterations = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val base = run(events)
    assert(base == run(events.repartition(7)),
      "integer iteration must not depend on partitioning")
    assert(base.keySet == Set("a", "b", "c"))
    // total mass ≤ Scale (floors + dangling leak mass, never create it)
    assert(base.values.sum <= Graph.Scale)
    // sink-heavy b (self-loop + inflow from a) outranks source-only a
    assert(base("b") > base("a"))
    // every node keeps at least the undamped base share
    val baseShare = ((10000 - 8500) * (Graph.Scale / 3)) / 10000
    assert(base.values.forall(_ >= baseShare))
  }

  test("pageRank: damping 10000 gives pure inflow, 0 gives uniform") {
    val uniform = Graph.pageRank(edges, iterations = 2, dampingBp = 0)
      .collect().map(_.getLong(1)).toSet
    assert(uniform.size == 1, "no damping => every node at base share")
    val pure = Graph.pageRank(edges, iterations = 1, dampingBp = 10000)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // with full damping, round 1: a gets no inflow => rank 0
    assert(pure("a") == 0L)
  }
}
