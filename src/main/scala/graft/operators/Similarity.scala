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

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into `nCells` cells; each query probes only its
    * `nProbe` nearest cells. The standard billion-scale ANN layout
    * (IVF-flat): at 100 TB the cell assignment is a narrow map over the
    * corpus (centroids broadcast as literals), the per-cell inverted lists
    * are just a hash-partitioned column, and query fan-out is nProbe/nCells
    * of the corpus instead of all of it.
    *
    * Deterministic: seeded KMeans, centroid distances via the native codegen
    * dot/norm expressions, rank ties broken by neighbor id. Training scans a
    * corpus SAMPLE driver-side only for the tiny centroid matrix — the
    * corpus itself never collects. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int = 5,
              nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // Train on a bounded sample: centroid quality needs ~100 points per
    // cell, not the corpus (at 100 TB you never fit on the full corpus);
    // capped iterations — IVF recall is governed by nProbe, not by
    // fully-converged centroids.
    val train = corpus
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .limit(math.max(nCells * 200, 2000))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").fit(train)
    val centroids = model.clusterCenters.map(_.toArray.toSeq)

    // Distance to every centroid as codegen'd expressions over literal
    // centroid arrays; cell = argmin, probes = nProbe smallest.
    def cellDists(vec: Column): Column = {
      val ds = centroids.zipWithIndex.map { case (c, i) =>
        val cArr = array(c.map(lit): _*)
        val d2 = dot(vec, vec) - lit(2.0) * dot(vec, cArr) +
          lit(c.map(x => x * x).sum)
        struct(d2.as("d"), lit(i).as("cell"))
      }
      array_sort(array(ds: _*))
    }
    val c = prep(corpus, idCol, vecCol)
      .withColumn("cell", element_at(cellDists(col("vec")), 1).getField("cell"))
    val q = prep(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"),
        explode(transform(slice(cellDists(col("vec")), 1, nProbe),
          s => s.getField("cell"))).as("cell"))

    val scored = c.as("c").join(broadcast(q.as("q")),
        col("c.cell") === col("q.cell") && col("c.id") =!= col("q.query_id"))
      .withColumn("cosine",
        round(cosinePrenormed(col("c.vec"), col("q.qvec"), col("c.nrm"), col("q.qnrm")), 6))
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
