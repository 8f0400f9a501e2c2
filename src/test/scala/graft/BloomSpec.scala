package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bloom

/** Bloom-index guarantees: NO false negatives ever (the property that makes
  * the filter a safe dedup pre-screen), bounded false positives on disjoint
  * keys, the packed word form carries exactly the index's bits, and the
  * degenerate m=1 filter saturates (every probe positive) rather than
  * misbehaving. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("probe: every corpus key is bloom-positive (no false negatives)") {
    val (m, k) = (1L << 14, 4)
    val idx = Bloom.buildIndex(docs, "text", m, k)
    val hits = Bloom.probe(docs, "doc_id", "text", idx, m, k)
    assert(hits.where(!col("bloom_hit")).count() == 0,
      "a Bloom filter must never reject a member")
  }

  test("probe: disjoint keys mostly miss; fp rate stays near theory") {
    import spark.implicits._
    val (m, k) = (1L << 14, 4)
    val corpus = docs.limit(200)
    val idx = Bloom.buildIndex(corpus, "text", m, k)
    val probes = (0 until 500).map(i => (i.toLong, s"definitely-not-in-corpus-$i"))
      .toDF("doc_id", "text")
    val fp = Bloom.probe(probes, "doc_id", "text", idx, m, k)
      .where(col("bloom_hit")).count()
    // load kn/m ≈ 0.05 → fp ≈ (1-e^-0.05)^4 ≈ 6e-6; allow a generous band
    assert(fp <= 5, s"false-positive rate implausibly high: $fp/500")
  }

  test("packedIndex: popcount over words equals the distinct position count") {
    val (m, k) = (1L << 12, 4)
    val idx = Bloom.buildIndex(docs, "text", m, k).localCheckpoint()
    val nPos = idx.count()
    val packed = Bloom.packedIndex(idx)
    val nBits = packed.agg(sum(expr("bit_count(bits)"))).collect()(0).getLong(0)
    assert(nBits == nPos, s"packed words must carry exactly the index bits: $nBits vs $nPos")
    assert(packed.count() <= m / 64 + 1, "word count bounded by m/64")
  }

  test("degenerate m=1: filter saturates after one insert, probe still exact about it") {
    import spark.implicits._
    val one = Seq((0L, "anything")).toDF("doc_id", "text")
    val idx = Bloom.buildIndex(one, "text", m = 1L, k = 4)
    assert(idx.count() == 1, "all positions collapse to bit 0")
    val probes = Seq((1L, "other"), (2L, "another")).toDF("doc_id", "text")
    val out = Bloom.probe(probes, "doc_id", "text", idx, m = 1L, k = 4)
    assert(out.where(!col("bloom_hit")).count() == 0,
      "a saturated filter answers positive for every key")
  }
}
