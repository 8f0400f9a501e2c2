package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the family the near-dup
  * connected-components machinery ([[Dedup.connectedComponents]]) opened,
  * extended to WEIGHTED value propagation: Markov transition graphs from
  * event streams and a PageRank-style power iteration. The curation use is
  * graph-based data valuation — rank states/domains/documents by stationary
  * visit mass instead of raw counts (a raw count ranks a self-looping spam
  * state highly; PageRank discounts mass that only arrives from
  * low-mass sources).
  *
  * Everything is EXACT INTEGER fixed-point: ranks are longs scaled by
  * 10¹², damping is basis points, per-edge contributions are integer floor
  * divisions, inflows are long sums. Double-precision power iteration is
  * partitioning-DEPENDENT (float sums reassociate across partitions);
  * integer sums are order-independent, so the same graph yields the same
  * bits on any cluster layout and any md5-capable oracle engine — the
  * [[TextOps.unigramSurprisal]] exact-arithmetic discipline applied to
  * iteration instead of scoring.
  *
  * Scale shape (100 TB events / billion-edge graphs): edge construction is
  * one user-partitioned window; the iteration is k× (edge⋈rank equi-join on
  * src + dst-partitioned long-sum aggregate) — the standard Pregel layout as
  * pure DataFrame ops, state on executors, lineage truncated per round with
  * lazy localCheckpoints (the [[Dedup.connectedComponents]] discipline).
  * Nothing collects to the driver at any scale.
  */
object Graph {

  /** Rank fixed-point scale: 1.0 of probability mass = 10¹². */
  val Scale = 1000000000000L

  /** Per-entity transition edges: for each `groupCol` trace ordered by
    * `orderCols` (total order — include a unique id as tie-break), an edge
    * from each state to its successor, aggregated to (src, dst, weight).
    * The Markov-chain construction over session traces: one shuffle on the
    * group key, per-group window state bounded by trace length, then a
    * (src,dst)-partitioned count aggregate (map-side combined). */
  def transitionEdges(df: DataFrame, groupCol: String, orderCols: Seq[Column],
                      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.select(col(groupCol), col(stateCol).as("dst"),
        lag(col(stateCol), 1).over(w).as("src"))
      .where(col("src").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Row-normalized transition matrix in basis points:
    * p_bp = (weight·10⁴) div Σ_dst weight — integer floor, engine-portable.
    * The |src|-row out-weight table re-joins the |edges|-row list; AQE
    * broadcasts it whenever |src| is small (it is here: states, not docs). */
  def transitionMatrix(edges: DataFrame): DataFrame = {
    val outw = edges.groupBy(col("src")).agg(sum(col("weight")).as("ow"))
    edges.join(outw, "src")
      .select(col("src"), col("dst"), col("weight"),
        expr("(weight * 10000) div ow").as("p_bp"))
  }

  /** PageRank power iteration over a weighted edge list, exact fixed-point:
    *
    *   r₀(v)   = S div n                       (S = [[Scale]], n = |nodes|)
    *   c(e)    = (r(src)·weight) div outw(src)  (decimal → long floor)
    *   r'(v)   = ((10⁴−d)·(S div n)) div 10⁴ + (d·Σ_{e→v} c(e)) div 10⁴
    *
    * with damping `d` in basis points. Dangling mass (nodes with no
    * out-edges) and the per-division floor remainders leak out of the
    * system rather than redistributing — the simple absorbing variant;
    * ranks are lower bounds that converge in ordering, which is what a
    * ranking consumer uses. Every quantity is integral: the per-edge
    * product runs in decimal(38,0) (r·weight overflows a long once weights
    * pass ~10⁶ at r≈S), the floor lands back in a long, and inflow sums
    * are longs bounded by total mass S — order-independent at any
    * parallelism.
    *
    * Plan per round: one equi-join of the (pinned) out-weighted edge list
    * to the current rank table on src, one dst-partitioned sum, one left
    * join back to the (pinned) node list; the new rank table is lazily
    * localCheckpoint-ed so plan depth stays constant across rounds. */
  def pageRank(edges: DataFrame, iterations: Int = 3,
               dampingBp: Int = 8500): DataFrame = {
    require(iterations >= 1, "iterations >= 1")
    require(dampingBp >= 0 && dampingBp <= 10000, "dampingBp in [0, 10000]")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    val outw = edges.groupBy(col("src")).agg(sum(col("weight")).as("ow"))
    val edgesW = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("weight"), col("ow"))
      .localCheckpoint(eager = false)
    val n = nodes.agg(count(lit(1)).cast("long").as("n")).scalar()
    var ranks = nodes.withColumn("__n", n)
      .select(col("node"), expr(s"$Scale div __n").as("r"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iterations) {
      val inflow = edgesW.join(ranks, edgesW("src") === ranks("node"))
        .select(col("dst"),
          expr("(cast(r AS decimal(38,0)) * weight) div ow").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inf"))
      ranks = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .withColumn("__n", n)
        .select(nodes("node"),
          expr(s"(((10000 - $dampingBp) * ($Scale div __n)) div 10000)" +
            s" + ($dampingBp * coalesce(inf, 0L)) div 10000").as("r"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), col("r").as("rank_sc"))
  }

  /** TRIANGLE ENUMERATION over an undirected edge list, degree-ordered —
    * the clustering-structure primitive (a kNN graph's triangle density is
    * the standard manifold-quality diagnostic; co-occurrence-graph
    * triangles surface phrase cliques). `pairs` is any (aCol, bCol) pair
    * frame; direction and duplicates are normalized away first.
    *
    * Algorithm: orient every edge from the endpoint with the smaller
    * (degree, node) key to the larger — a DAG under a total order, in which
    * each triangle has EXACTLY one node with two out-edges — then join
    * out-edge pairs (wedges, ordered by the same key so each wedge forms
    * once) against the edge set. Degree ordering is what makes this scale:
    * out-degrees are bounded by O(√|E|) on any graph (arboricity bound), so
    * the wedge count is Σ outdeg² ≤ |E|^{3/2} instead of Σ deg² — the
    * hub-node blowup a naive enumeration hits on skewed graphs. Three
    * vocab-/graph-sized hash joins, the corpus is never touched.
    *
    * Output: one row per triangle as the sorted triple (w_a < w_b < w_c) —
    * directly comparable to a lexicographic SQL enumeration. */
  def triangles(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = pairs
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(
            struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("o"))
      .select(col("o.s").as("src"), col("o.t").as("dst"), col("o.dt").as("ddeg"))
      .localCheckpoint(eager = false)
    val wedges = oriented.as("a")
      .join(oriented.as("b"),
        col("a.src") === col("b.src") &&
          (col("a.ddeg") < col("b.ddeg") ||
            (col("a.ddeg") === col("b.ddeg") && col("a.dst") < col("b.dst"))))
      .select(col("a.src").as("w"), col("a.dst").as("v1"), col("b.dst").as("v2"))
    wedges
      .join(oriented.select(col("src").as("v1"), col("dst").as("v2"))
        .hint("shuffle_hash"), Seq("v1", "v2"))
      .select(array_sort(array(col("w"), col("v1"), col("v2"))).as("t"))
      .select(col("t").getItem(0).as("w_a"), col("t").getItem(1).as("w_b"),
        col("t").getItem(2).as("w_c"))
  }
}
