package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-matrix TRANSFORMS (as opposed to [[Similarity]]'s search):
  * per-dimension standardization (whitening fit + apply) and a signed
  * random projection (the Johnson–Lindenstrauss / Achlioptas sketch) —
  * the feature-conditioning steps that run before quantization, ANN
  * indexing, or clustering at corpus scale.
  *
  * Exactness discipline: element values enter as integer micro-units
  * (floor(v·10⁶ + 0.5) of the exact float→double widening), so every
  * aggregate is an order-independent integer sum — the result is
  * partitioning-invariant and bit-reproducible in any engine. Where a
  * final double emerges (the z-score), its inputs are exact integers and
  * the expression is pinned term-for-term in the oracle, so IEEE gives
  * both engines the same bits (then round(·, 6) guards formatting).
  *
  * Scale shape:
  *   - [[dimStats]]: one posexplode + ONE hash aggregate with map-side
  *     partials — the shuffle carries dim rows per mapper, never
  *     |rows|×dim (the [[Similarity.groupCentroids]] argument).
  *   - [[standardize]]: the dim-row stats table re-joins the exploded
  *     corpus on `pos` — AQE broadcasts it (it is `dim` rows by
  *     construction); the corpus is touched by one narrow generate+map.
  *   - [[signedProjection]]: zero shuffles — a literal ±1 matrix folded
  *     per row with an exact integer zip_with/aggregate chain; the
  *     classic cheap dim-reduce before LSH/IVF when the native dim is
  *     4-16× the index dim.
  */
object Embeddings {

  /** Micro-unit scale for embedding elements. */
  val Scale = 1000000L

  private def vu(v: Column): Column =
    floor(v.cast("double") * Scale + 0.5).cast("long")

  /** Whitening FIT: per-dimension exact integer moments over the corpus.
    * Output (pos, n, sum_u, sumsq_u): n vectors, Σvu as decimal(38,0) and
    * Σvu² as decimal(38,0) — overflow-safe at any corpus size (a long Σvu²
    * saturates near 10⁶ billion-row corpora; decimal sums stay exact and
    * order-independent). mean/variance derive as (sum_u/n)/10⁶ and
    * (n·sumsq_u − sum_u²)/n² downstream. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("pos"), vu(col("v")).as("vu"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("vu").cast("decimal(38,0)")).as("sum_u"),
        sum((col("vu") * col("vu")).cast("decimal(38,0)")).as("sumsq_u"))

  /** Whitening APPLY: z-score every element against [[dimStats]] moments.
    *
    *   z = (vu·n − S) / sqrt(n·Q − S²)
    *
    * (algebraically (v−μ)/σ with the micro-unit scale cancelling): the
    * numerator and the sqrt argument are EXACT integers, so the only
    * floating steps are one sqrt and one divide — identical IEEE results
    * in any engine, then rounded to 6. Zero-variance dimensions emit 0.
    * Output: (id, pos, z), one row per element. */
  def standardize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val stats = dimStats(df, vecCol)
    df.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("id"), col("pos"), vu(col("v")).as("vu"))
      .join(stats, "pos")
      .select(col("id"), col("pos"),
        when(col("n") * col("sumsq_u") - col("sum_u") * col("sum_u") <= 0,
          lit(0.0))
          .otherwise(round(
            (col("vu") * col("n") - col("sum_u")).cast("double") /
              sqrt((col("n") * col("sumsq_u") - col("sum_u") * col("sum_u"))
                .cast("double")), 6)).as("z"))
  }

  /** Deterministic ±1 sign for projection cell (j, i): parity of the first
    * md5 byte of "rp:&lt;seed&gt;:&lt;j&gt;:&lt;i&gt;" — reproducible from
    * the seed alone in any md5-capable engine (the [[Dedup]] md5-48
    * convention applied to matrix generation). */
  def signMatrix(outDim: Int, inDim: Int, seed: Long = 42L): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (j, i) =>
      val d = md.digest(s"rp:$seed:$j:$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1 else -1
    }
  }

  /** Signed random projection (JL sketch): out_j = Σ_i sign(j,i)·vu_i over
    * the micro-unit elements — an exact integer sketch of the vector that
    * approximately preserves pairwise geometry (Achlioptas' database-
    * friendly ±1 projection, up to the common 1/√outDim factor, which a
    * cosine consumer cancels anyway). Output: (id, j, proj_u), outDim rows
    * per vector; the fold is a per-row zip_with+aggregate over literal
    * signs — no shuffle, no state. */
  def signedProjection(df: DataFrame, idCol: String, vecCol: String,
                       outDim: Int = 16, inDim: Int = 64,
                       seed: Long = 42L): DataFrame = {
    val signs = signMatrix(outDim, inDim, seed)
    val signsLit = array(signs.map(row =>
      array(row.map(s => lit(s.toLong)): _*)): _*)
    df.select(col(idCol).as("id"),
        transform(col(vecCol), v => vu(v)).as("vus"),
        posexplode(signsLit).as(Seq("j", "sgn")))
      .select(col("id"), col("j"),
        expr("aggregate(zip_with(vus, sgn, (v, s) -> v * s), 0L, (a, x) -> a + x)")
          .as("proj_u"))
  }
}
