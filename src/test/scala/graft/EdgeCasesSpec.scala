package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Dedup, Multimodal, Similarity, Skew}

/** Degenerate-input behavior of every library operator: empty tables,
  * single rows, and null payloads must flow through without exceptions and
  * with sensible (empty) results — the failure mode these catch is a
  * runtime error deep inside a 100 TB job when one partition turns out
  * empty or one document is blank. */
class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("dedup operators on an empty corpus return empty, not errors") {
    assert(Dedup.exact(emptyDocs, Seq("text"), "doc_id").count() == 0)
    assert(Dedup.exactJaccardJoin(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashLsh(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.nearDedupSurvivors(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("connectedComponents on empty pairs terminates with empty output") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0)
  }

  test("single-doc corpus: no self-pairs from any dedup path") {
    val one = Seq((1L, "hello world foo bar baz")).toDF("doc_id", "text")
    assert(Dedup.exactJaccardJoin(one, "doc_id", "text").count() == 0)
    assert(Dedup.minHashLsh(one, "doc_id", "text").count() == 0)
    val sig = one.select(col("doc_id"),
      graft.functions.SimHash64.simhash64(graft.operators.TextOps.tokens(col("text"))).as("sh"))
    assert(Dedup.simHashNearDupPairs(sig, "doc_id", "sh", 5).count() == 0)
    assert(Dedup.nearDedupSurvivors(one, "doc_id", "text").count() == 1)
  }

  test("blank and whitespace-only documents survive the shingle path") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real text here ok")).toDF("doc_id", "text")
    // blank docs shingle to [""] and can only match each other (jaccard 1.0)
    val pairs = Dedup.exactJaccardJoin(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("similarity with empty query set returns empty top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val noQueries = emb.where(col("vec_id") < 0)
    assert(Similarity.bruteForceTopK(emb, noQueries, "vec_id", "embedding").count() == 0)
    assert(Similarity.lshTopK(emb, noQueries, "vec_id", "embedding").count() == 0)
  }

  test("saltedJoin with empty fact or dim behaves as inner join (empty)") {
    val fact = Seq((1L, 10L)).toDF("k", "payload")
    val emptyDim = Seq.empty[(Long, String)].toDF("k", "name")
    assert(Skew.saltedJoin(fact, emptyDim, "k", 4, col("payload")).count() == 0)
  }

  test("multimodal expressions tolerate null payloads") {
    val df = Seq((1L, Some("x".getBytes("UTF-8"))), (2L, None))
      .toDF("id", "payload")
    val out = df.select(col("id"),
      Multimodal.sniffMime(col("payload")).as("mime"),
      Multimodal.byteLen(col("payload")).as("len"),
      Multimodal.fakeFeatures(col("payload"), 4).as("f"))
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toMap
    assert(!out(1L) && out(2L), "null payload → null length, no exception")
  }
}
