package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys: interleave the bits of two dimension
  * columns so that sorting by the single z value clusters BOTH dimensions at
  * once — the multi-dimensional data-skipping layout (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, re-expressed as plain columns + range partitioning).
  *
  * Why it matters at 100 TB: parquet readers prune row groups by min/max
  * stats. A corpus sorted by one key gives perfect pruning on that key and
  * NONE on any other; a z-sorted layout bounds BOTH dimension ranges inside
  * every z-contiguous run — an aligned bucket of 4^k consecutive z values
  * spans < 2^k distinct values of EACH dimension (the top 2(bits−k)
  * interleaved bits are fixed, so each dimension's top bits−k bits are
  * fixed). Queries filtering on either dimension skip most files.
  *
  * The z value is a pure codegen'd integer expression (2·bits shift/mask
  * terms, no UDF); layout itself is [[zOrderBy]] = range partition + local
  * sort — one shuffle, no global single-partition sort.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: bit i of `a` → z bit 2i, bit i of `b` → z bit 2i+1. Values
    * must already be bucketed into [0, 2^bits) — compose with pmod/width
    * bucketing as needed. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      (shiftright(al, i) % 2L) * lit(1L << (2 * i)) +
        (shiftright(bl, i) % 2L) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Range-partition by z and sort within partitions — the layout write
    * shape: each output file covers a contiguous z run, so per-file min/max
    * stats are tight in BOTH interleaved dimensions. `numFiles` range
    * partitions ≈ `numFiles` output files when followed by a write. */
  def zOrderBy(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
}
