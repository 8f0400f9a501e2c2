package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor / similarity search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact top-k by cosine — the correctness baseline.
  *     The query set is broadcast (it is small by definition), the corpus is
  *     scanned once, and per-query top-k is a bounded window; at 1000
  *     executors this is one broadcast + one corpus scan + one k·|queries|
  *     sized shuffle — no corpus×corpus blowup.
  *   - [[lshTopK]]: random-hyperplane LSH bucketing — corpus and queries are
  *     bucketed by projection sign bits; only same-bucket pairs are scored.
  *     Scale path when even one full corpus scan per query batch is too much;
  *     recall is tunable via number of planes / probe multiplicity.
  */
object Similarity {

  private def prep(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", norm(col("vec")))

  /** Exact cosine top-k: for each query vector, the k nearest corpus vectors
    * (excluding itself when ids collide). Output (query_id, neighbor_id,
    * cosine, rank) with cosine rounded to 6 decimals and rank ties broken by
    * neighbor id — fully deterministic. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    val c = prep(corpus, idCol, vecCol)
    val q = prep(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cosine",
        round(cosinePrenormed(col("vec"), col("qvec"), col("nrm"), col("qnrm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Approximate top-k via random-hyperplane LSH: score only same-bucket
    * pairs. Same output shape as [[bruteForceTopK]]; rank is within the
    * bucket-restricted candidate set. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int = 5,
              nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = randomPlanes(nPlanes, dim, seed)
    val c = prep(corpus, idCol, vecCol)
      .withColumn("bucket", hyperplaneBucket(col("vec"), planes))
    val q = prep(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"),
        col("nrm").as("qnrm"), hyperplaneBucket(col("vec"), planes).as("qbucket"))
    val scored = c.join(broadcast(q),
        col("bucket") === col("qbucket") && col("id") =!= col("query_id"))
      .withColumn("cosine",
        round(cosinePrenormed(col("vec"), col("qvec"), col("nrm"), col("qnrm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all (i < j) with cosine ≥ threshold.
    * Exact form is a self-join; the corpus side is scanned once per
    * partition of the other (AQE picks broadcast when one side fits). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val a = prep(df, idCol, vecCol)
      .select(col("id").as("id_a"), col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = prep(df, idCol, vecCol)
      .select(col("id").as("id_b"), col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(cosinePrenormed(col("vec_a"), col("vec_b"), col("nrm_a"), col("nrm_b")), 6))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
