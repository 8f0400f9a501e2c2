package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter corpus membership index, built and probed entirely as
  * DataFrame operations — the cheap screen in front of [[Dedup
  * .incrementalSurvivors]]'s exact fingerprint anti-join: a standing corpus
  * publishes a tiny bit-position index; each incoming batch probes it and
  * only bloom-positive rows (a few percent) pay the exact check. A Bloom
  * filter never yields false NEGATIVES, so rows the probe clears are
  * definitively new — that asymmetry is what makes it a safe pre-filter.
  *
  * Everything is deterministic integer arithmetic over the md5-48 hash
  * basis ([[Dedup.md5Hash48]]), so build AND probe — including which keys
  * false-positive — are bit-reproducible in any md5-capable engine; the
  * registered query's DuckDB oracle replays the whole pipeline, not a
  * summary.
  *
  * Representations: [[buildIndex]] emits the set bit POSITIONS as distinct
  * rows — at most `m` of them, exact-joinable, the verifiable form.
  * [[packedIndex]] ORs the positions into 64-bit words (`m/64` rows) — the
  * memory-dense artifact a 100 TB deployment would broadcast to executors
  * (1 GB of words indexes ~10⁹ corpus keys at 1% fp); probing it in-plan
  * needs a map-side lookup structure, so the in-plan probe here targets the
  * position form while the packed words are the storage/shipping layout.
  */
object Bloom {

  /** The k bit positions of a key — Kirsch–Mitzenmacher double hashing:
    * pos_i = (h1 + i · h2) mod m with h2 forced odd, over two independent
    * md5-48 folds. 48-bit hashes keep every intermediate (≤ 2⁴⁹ + k·2⁴⁹)
    * far inside long range. */
  def positions(key: Column, m: Long, k: Int): Column = {
    require(m > 0 && k > 0, "need positive m and k")
    val h1 = Dedup.md5Hash48(key)
    val h2 = Dedup.md5Hash48(concat(key, lit("#bloom"))) * 2 + 1
    transform(sequence(lit(0), lit(k - 1)),
      i => pmod(h1 + i.cast("long") * h2, lit(m)))
  }

  /** Build the index over a corpus key column: the DISTINCT set bit
    * positions, as rows. One narrow explode + one distinct shuffle bounded
    * by `m` output rows regardless of corpus size. */
  def buildIndex(corpus: DataFrame, keyCol: String, m: Long, k: Int): DataFrame =
    corpus.select(explode(positions(col(keyCol), m, k)).as("pos")).distinct()

  /** The positions packed into 64-bit words: (word_idx, bits), `m/64` rows —
    * the dense storage/shipping form of the same filter. */
  def packedIndex(index: DataFrame): DataFrame =
    index.groupBy(expr("pos div 64").as("word_idx"))
      .agg(expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").as("bits"))

  /** Probe the position index: (idCol, bloom_hit) per batch row —
    * bloom_hit ⇔ ALL k positions are set. The batch explodes to k rows per
    * key and equi-joins the index (≤ m rows — broadcast-sized by
    * construction; AQE sees that), then one id-partitioned count-back.
    * Duplicate positions within a key (h1 collisions) still produce k
    * joined rows, so the count-of-hits = k test is exact. */
  def probe(batch: DataFrame, idCol: String, keyCol: String,
            index: DataFrame, m: Long, k: Int): DataFrame =
    batch.select(col(idCol).as("id"),
        explode(positions(col(keyCol), m, k)).as("pos"))
      .join(index.select(col("pos"), lit(1).as("__hit")), Seq("pos"), "left")
      .groupBy(col("id"))
      .agg((count(col("__hit")) === k).as("bloom_hit"))
      .select(col("id").as(idCol), col("bloom_hit"))
}
