package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: a mergeable d×w frequency summary of an unbounded key
  * stream (Cormode & Muthukrishnan 2005). The 100 TB shape of "how often
  * does each of these tokens/URLs/ids occur" when the key universe is too
  * large to materialize but per-key estimates only need to be
  * one-sided-approximate: the sketch is O(d·w) cells regardless of corpus
  * size, partial sketches from any data split merge by cell-wise summation
  * (same property the X47 HLL row exploits for distinct counts), and the
  * estimate min_r cells[r][h_r(key)] NEVER undercounts — collisions only
  * inflate it (by ≤ εN with w = e/ε at confidence 1-δ, d = ln 1/δ).
  *
  * Distributed shape: build is one narrow map (d positions per occurrence)
  * into ONE hash aggregate on (row, position) — map-side partials mean each
  * mapper ships at most d·w cells into the shuffle, not its token count.
  * Estimation broadcasts the d·w-cell sketch table and aggregates min over
  * the d probed cells per key.
  *
  * Hash basis is the engine-portable [[Dedup.md5Hash48]] over
  * `"<row>:<key>"`, so the whole sketch — positions, cells, estimates — is
  * exactly reproducible in the DuckDB oracle (see
  * [[graft.queries.TextQueries]] `sketch_cms_tokens`): the driver
  * hash-compares the full approximate pipeline, not just its shape.
  */
object Sketch {

  /** Row-r hash position of `key` in a width-`width` CMS row: the md5-48
    * fold of `"r:key"` mod width. Key should be a string column (see the
    * [[Sampling]] cross-engine note on binary casts of numerics). */
  def cmsPos(key: Column, row: Int, width: Int): Column =
    pmod(Dedup.md5Hash48(concat(lit(s"$row:"), key)), lit(width.toLong)).cast("int")

  private def posArray(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r => cmsPos(key, r, width)): _*)

  /** Build the sketch from one row per key OCCURRENCE (weight 1 each):
    * output (r, pos, cnt) with at most depth·width rows. Sketches built
    * from disjoint splits of the stream merge by summing cnt on (r, pos) —
    * see [[cmsMerge]]. */
  def cmsBuild(items: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 1, "need depth >= 1 and width >= 1")
    items
      .select(posexplode(posArray(col(keyCol), depth, width)).as(Seq("r", "pos")))
      .groupBy(col("r"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise union of partial sketches built with identical (depth,
    * width): the mergeability that lets every executor (or every daily
    * batch) sketch independently. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ union _)
      .groupBy(col("r"), col("pos"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for the keys of `probes` (any extra probe columns are
    * preserved): est = min over the d probed cells, absent cell = 0. The
    * sketch side is d·w rows → broadcast; cost is one narrow pass over the
    * probes. Output: probes' columns + `cms_est`. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    val probeCols = probes.columns.map(col).toSeq
    probes
      .select(probeCols :+
        posexplode(posArray(col(keyCol), depth, width)).as(Seq("r", "pos")): _*)
      .join(broadcast(sketch), Seq("r", "pos"), "left_outer")
      .groupBy(probeCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
