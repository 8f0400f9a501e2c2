package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic-sampling guarantees: membership stability under
  * repartitioning (the property seeded RNG sampling lacks), disjoint and
  * covering hash splits, stratified rate targeting. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("hashSample: identical membership regardless of partitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSample(df, "text", 200).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val base = ids(docs)
    assert(base == ids(docs.repartition(13)), "sample must not depend on partitioning")
    assert(base.nonEmpty && base.size < docs.count())
    // rate lands in a loose band around 20%
    val rate = base.size.toDouble / docs.count()
    assert(rate > 0.1 && rate < 0.3, s"20% target, got $rate")
  }

  test("hashSplit: 90/10 split is disjoint and covering") {
    val train = Sampling.hashSplit(docs, "text", 0, 900)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val eval = Sampling.hashSplit(docs, "text", 900, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((train & eval).isEmpty, "splits must be disjoint")
    assert(train.size + eval.size == docs.count(), "splits must cover")
  }

  test("stratifiedHashSample: per-stratum rates hit their targets") {
    val sampled = Sampling.stratifiedHashSample(
      docs, "text", "lang", Map("en" -> 1000), defaultPermille = 0)
    val langs = sampled.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("en"), "permille 1000/0 must keep exactly the en stratum")
    val all = docs.where(col("lang") === "en").count()
    assert(sampled.count() == all)
  }
}
