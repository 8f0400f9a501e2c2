package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The composed stored-index lifecycle law: build → append → delete →
  * vacuum → probe must equal a direct IVF over (base ∪ delta) ∖ deletes
  * with the same day-0 quantizer — maintenance is invisible to serving. */
class AnnLifecycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("lifecycle probe ≡ direct IVF over the maintained corpus") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.where(col("vec_id") % 10 =!= 0)
    val delta = emb.where(col("vec_id") % 10 === 0)
    val deletes = emb.where(col("vec_id") % 7 === 0).select(col("vec_id"))
    val q = emb.where(col("vec_id") < 10)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_lifecycle")
    try {
      val got = graft.examples.AnnIndexLifecycleDemo.lifecycle(
          spark, tmp.resolve("index").toString,
          base, delta, deletes, q, "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
      // the reference: same day-0 quantizer (trained on base — exactly what
      // lifecycle() trains on), maintained corpus materialized directly
      val cents = Similarity.trainIvfCentroids(base, "embedding", 16, 42L)
      val maintained = emb.where(col("vec_id") % 7 =!= 0)
      val want = Similarity.ivfTopK(maintained, q, "vec_id", "embedding",
          k = 5, nProbe = 4, centroids = Some(cents))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
      assert(got == want, "maintained index must serve exactly the maintained corpus")
      assert(got.nonEmpty)
      // the deletes actually bit: no deleted id appears as a neighbor
      assert(!got.exists(_._2 % 7 == 0), "deleted vectors must not be served")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp.toString)).deleteRecursively()
    }
  }
}
