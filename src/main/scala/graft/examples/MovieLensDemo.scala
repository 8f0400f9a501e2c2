package graft.examples

import org.apache.spark.sql.SparkSession
import graft.engine.{MovieAnalysis, Sources}

/** The reference engine's CLI, re-expressed (MovieRank.java:145-214 +
  * MovieRating.java:140-210 in one driver): run both MovieLens pipelines over
  * movies.csv/ratings.csv and write tab-separated output like the reference's
  * TextOutputFormat sink (S4), printing elapsed seconds like the reference's
  * driver (MovieRank.java:205-210).
  *
  * Usage: runMain graft.examples.MovieLensDemo <movies.csv> <ratings.csv> [outDir]
  */
object MovieLensDemo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MovieLensDemo <movies.csv> <ratings.csv> [outDir]")
    val t0 = System.nanoTime()
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("movielens-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val movies = Sources.moviesCsv(spark, args(0))
    val ratings = Sources.ratingsCsv(spark, args(1))

    val rank = MovieAnalysis.movieRank(movies, ratings, asc = false)
    val rating = MovieAnalysis.movieRating(movies, ratings)

    println("== MovieRank (top by review count) ==")
    rank.show(10, truncate = false)
    println("== MovieRating (avg rating, support > 10, avg > 4.0) ==")
    rating.show(10, truncate = false)

    args.lift(2).foreach { out =>
      rank.write.mode("overwrite").option("sep", "\t").csv(s"$out/movierank")
      rating.write.mode("overwrite").option("sep", "\t").csv(s"$out/movierating")
      println(s"wrote $out/movierank and $out/movierating")
    }
    println(f"Time taken: ${(System.nanoTime() - t0) / 1e9}%.1f sec")
    spark.stop()
  }
}
