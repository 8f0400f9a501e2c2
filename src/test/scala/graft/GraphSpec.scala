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

  test("triangles: known graph — K4 + pendant + disjoint triangle, dup edges") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
        (3L, 4L), (4L, 5L), (6L, 7L), (7L, 8L), (6L, 8L),
        (2L, 1L), (3L, 1L)) // reversed duplicates must not double-count
      .toDF("a", "b")
    val t = Graph.triangles(pairs, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t.length == t.toSet.size, "each triangle enumerated exactly once")
    assert(t.toSet == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L), (6L, 7L, 8L)))
  }

  test("triangles: equals cubic brute force on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 24
    val es = (for {
      i <- 0 until n; j <- (i + 1) until n if rnd.nextDouble() < 0.25
    } yield (i.toLong, j.toLong)).toVector
    val df = es.toDF("a", "b")
    val got = Graph.triangles(df, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val eset = es.toSet
    val want = (for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
      c <- (b + 1) until n.toLong
      if eset((a, b)) && eset((a, c)) && eset((b, c))
    } yield (a, b, c)).toSet
    assert(got == want)
  }
}
