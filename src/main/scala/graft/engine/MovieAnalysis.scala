package graft.engine

import org.apache.spark.sql.DataFrame

/** The reference engine's user-facing API, verbatim semantics: a user of
  * tnaimisha/MapreduceMovieAnalysis-Cloud runs two pipelines (README.md:12-13)
  * over MovieLens-format movies/ratings tables. This facade is the drop-in:
  * load with [[Sources.moviesCsv]]/[[Sources.ratingsCsv]], call one of these,
  * write the result anywhere `DataFrameWriter` reaches (the reference's
  * tab-text sink ≙ `.write.option("sep", "\t").csv(out)`).
  *
  * Semantic deltas vs the reference, all documented in SURVEY.md §7.5:
  * comma-titles are parsed per RFC-4180 (quotes stripped; reference keeps
  * them, MovieRank.java:44-47); join misses are dropped (inner join; the
  * reference emits literal "null" titles, MovieRank.java:67-70 — faithful
  * variant at [[RefQueries.joinWithNullTitle]]); sort is globally ordered
  * (the reference's multi-reducer output was only per-partition sorted,
  * MovieRank.java:200-203).
  */
object MovieAnalysis {

  /** MovieRank (MovieRank.java:145-214): movies ranked by review count.
    * Output (movieId, title, cnt) ordered by (cnt, movieId).
    * @param asc true = literal reference order (Hadoop ascending IntWritable
    *            shuffle sort); false = README.md:12 "popularity" intent. */
  def movieRank(movies: DataFrame, ratings: DataFrame, asc: Boolean = true): DataFrame =
    RefQueries.rankByCount(ratings, movies,
      factKey = "movieId", dimKey = "movieId", titleCol = "title", asc = asc)
      .withColumnRenamed("key", "movieId")

  /** MovieRating (MovieRating.java:140-210): movies by average rating, only
    * those with > minCount ratings and average > minAvg (strict, per
    * MovieRating.java:97,100; README.md:13 "fewer than 10 ... ignored").
    * Output (movieId, title, avg_rating, num_ratings) ordered by
    * (avg_rating, movieId). */
  def movieRating(movies: DataFrame, ratings: DataFrame,
                  minCount: Long = 10L, minAvg: Double = 4.0,
                  asc: Boolean = true): DataFrame =
    RefQueries.ratingByAvg(ratings, movies,
      factKey = "movieId", dimKey = "movieId", titleCol = "title",
      measure = "rating", minCount = minCount, minAvg = minAvg, asc = asc)
      .withColumnRenamed("key", "movieId")
}
