package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference engine's two query semantics (SURVEY.md §2.10), expressed as
  * one lazily-composed Spark plan each, parameterized over (fact, dim) so the
  * same shapes run on both MovieLens CSV and the driver's star schema.
  *
  * Reference shape (per pipeline): two chained MapReduce jobs with a durable
  * intermediate (MovieRank.java:169,194) — here a single DataFrame whose
  * physical plan is:
  *   Scan(fact) → BroadcastHashJoin(dim) → partial HashAggregate →
  *   Exchange(hash) → final HashAggregate → Filter(HAVING) →
  *   Exchange(range) → Sort
  * i.e. exactly two in-flight shuffles and zero durable intermediates; the
  * DistributedCache replicated-HashMap join (MovieRank.java:30-51,67) becomes
  * `broadcast(dim)` → BroadcastExchangeExec.
  *
  * Scale notes (100 TB design):
  *   - the dimension is broadcast explicitly — at any realistic movie/part
  *     dimension size (≪ executor memory) this removes the fact-side shuffle
  *     a sort-merge join would need;
  *   - aggregation keys (dimKey, title) are low-cardinality relative to the
  *     fact, so partial (map-side) aggregation — which Spark always plants —
  *     collapses the shuffle to |dim| rows per task, the same win the
  *     reference's (disabled) combiner chased (MovieRank.java:80-95,161);
  *   - the final global sort range-partitions only the aggregated rows
  *     (|dim|-sized), never the fact.
  */
object RefQueries {

  /** Q1 "MovieRank" (MovieRank.java:145-214; README.md:12): rank dimension
    * members by fact-row count.
    *
    * Output: (dimKey, title, cnt) totally ordered by (cnt, dimKey) — the
    * unique dimKey tie-break makes row order deterministic for the oracle
    * (the reference's multi-reducer job2 was NOT globally sorted — SURVEY.md
    * §2.5 O1a; we implement a true global sort).
    *
    * @param asc literal reference semantics sort ascending (Hadoop default
    *            IntWritable comparator); README intent is descending.
    */
  def rankByCount(fact: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String, titleCol: String,
                  asc: Boolean = true): DataFrame = {
    val joined = fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "inner")
    val agg = joined
      .groupBy(dim(dimKey).as("key"), dim(titleCol).as("title"))
      .agg(count(lit(1)).as("cnt"))
    val cntOrder = if (asc) col("cnt").asc else col("cnt").desc
    agg.orderBy(cntOrder, col("key").asc)
  }

  /** Q2 "MovieRating" (MovieRating.java:140-210; README.md:13): per-dimension
    * average of a fact measure, kept only above support and quality
    * thresholds (strict `>`, MovieRating.java:97,100), sorted by the average.
    *
    * avg is rounded to 4 decimals *in the output only* (HAVING compares the
    * raw double) — double-sum associativity differences vs the DuckDB oracle
    * are ~1e-12, far below both the output rounding and any realistic
    * threshold gap (SURVEY.md §7.5).
    */
  def ratingByAvg(fact: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String, titleCol: String,
                  measure: String, minCount: Long, minAvg: Double,
                  asc: Boolean = true): DataFrame = {
    val joined = fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "inner")
    val agg = joined
      .groupBy(dim(dimKey).as("key"), dim(titleCol).as("title"))
      .agg(count(lit(1)).as("num_ratings"), avg(fact(measure)).as("avg_raw"))
      .where(col("num_ratings") > minCount && col("avg_raw") > minAvg)
      .withColumn("avg_rating", round(col("avg_raw"), 4))
      .drop("avg_raw")
    val avgOrder = if (asc) col("avg_rating").asc else col("avg_rating").desc
    agg.select(col("key"), col("title"), col("avg_rating"), col("num_ratings"))
      .orderBy(avgOrder, col("key").asc)
  }

  /** J1a join-miss policy (SURVEY.md §2.3): the reference's missing-dimension
    * probe emits the literal string "null" as the title (HashMap.get → null,
    * unchecked concat, MovieRank.java:67-70). Faithful variant: left-outer +
    * coalesce to the literal. Exposed for the quirk-pinning unit tests; the
    * registered queries use clean inner-join semantics. */
  def joinWithNullTitle(fact: DataFrame, dim: DataFrame,
                        factKey: String, dimKey: String,
                        titleCol: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "left_outer")
      .withColumn("title", coalesce(dim(titleCol), lit("null")))
}
