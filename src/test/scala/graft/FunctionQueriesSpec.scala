package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, FunctionQueries, SimilarityQueries, TextQueries}

/** Function-battery smoke + approx-sketch tolerance + plan-shape assertions
  * for the extension queries (the DuckDB oracle covers values at sf0.01). */
class FunctionQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("every function query is non-empty and oracle-or-documented") {
    FunctionQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, dir).count() > 0, s"$name empty on sf0.001")
    }
    val missing = FunctionQueries.queries.keySet -- FunctionQueries.oracles.keySet
    assert(missing.isEmpty, s"every function query carries an oracle, got: $missing")
  }

  test("approx_count_distinct within 5% of exact per group") {
    // the registered query folds this bound into its within_5pct output
    // column (oracle-compared); this pins the RAW estimate independently
    val li = graft.engine.Sources.lineitem(spark, dir)
    val both = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"group ${r.getString(0)}: approx $a vs exact $e")
    }
    val flags = FunctionQueries.queries("agg_approx_distinct")(spark, dir)
      .collect().map(_.getInt(2))
    assert(flags.forall(_ == 1), "within_5pct flag must hold on every group")
  }

  test("TopKAggregator query ≡ window row_number form; partial agg in plan") {
    import graft.queries.RefParityQueries
    val viaAgg = RefParityQueries.queries("window_topk_agg")(spark, dir)
    val viaWin = RefParityQueries.queries("window_topk_per_brand")(spark, dir)
    val a = viaAgg.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val w = viaWin.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(a.toSeq == w.toSeq)
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate") ||
      plan.contains("HashAggregate"), s"expected aggregate-based plan:\n$plan")
  }

  test("TopKAggregator merge keeps bounded, ordered buffers") {
    import graft.functions.TopKAggregator
    import graft.functions.TopKAggregator.In
    val agg = new TopKAggregator(2)
    val b1 = Seq(In(5.0, 1), In(3.0, 2)).foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq(In(4.0, 3), In(6.0, 4)).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(b1, b2))
    assert(merged == Seq(In(6.0, 4), In(5.0, 1)))
    // tie-break: equal values → smaller id first
    val t = Seq(In(1.0, 9), In(1.0, 3), In(1.0, 7)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(t) == Seq(In(1.0, 3), In(1.0, 7)))
  }

  test("text queries: scan reads only doc_id + text (column pruning)") {
    val plan = TextQueries.queries("text_token_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected pruned scan in:\n$plan")
  }

  test("minhash signature plan: partial aggregation before the shuffle") {
    val plan = DedupQueries.queries("dedup_minhash_lsh")(spark, dir)
      .queryExecution.executedPlan.toString
    // partial min() aggregates must appear (map-side combine of signatures)
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"expected partial aggregation in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "LSH must never degenerate to an all-pairs join")
  }

  test("similarity top-k plan: query side broadcast, no corpus shuffle join") {
    val plan = SimilarityQueries.queries("sim_topk_bruteforce")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query set must be the broadcast side:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus must not shuffle for the scoring join")
  }

  test("q3 plan: date filters pushed to scans, customer side broadcast") {
    val plan = FunctionQueries.queries("q3_shipping_priority")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"filtered customer dim must broadcast:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate")
      || plan.contains("LessThan(o_orderdate"),
      s"order-date predicate must reach the parquet scan:\n$plan")
    assert(plan.contains("GreaterThan(l_shipdate"),
      s"ship-date predicate must reach the parquet scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("anti/semi joins plan as hash joins, not cartesian") {
    for (q <- Seq("join_semi", "join_anti")) {
      val plan = FunctionQueries.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi") || plan.contains("LeftAnti"),
        s"$q must keep the dedicated join kind:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q degenerated to cartesian")
    }
  }

  test("HLL sketches: merged per-source union matches the direct sketch and the exact count") {
    val row = FunctionQueries.queries("agg_hll_union")(spark, dir).collect().head
    assert(row.getAs[Long]("exact_texts") > 0)
    assert(row.getAs[Int]("union_within_5pct") == 1,
      "register-wise union of per-source sketches must stay within 5% of exact")
    assert(row.getAs[Int]("direct_within_5pct") == 1)
  }
}
