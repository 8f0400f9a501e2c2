package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CurationQueries, DedupQueries, EventQueries, FunctionQueries, LexicalQueries, RefParityQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the extension set) registers at
  * least one named query here; each query with SQL-expressible semantics also
  * registers DuckDB oracle SQL with IDENTICAL column names/types and a total
  * ORDER BY (unique tie-break key) so the driver's hash compare is
  * deterministic. Queries are contributed by per-area registries under
  * [[graft.queries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_movierank")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefParityQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries ++
      FunctionQueries.queries ++ CurationQueries.queries ++
      LexicalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys (non-SQL-expressible ops — seeded
    * xxhash64 MinHash/SimHash/LSH, the fake-decode stub) get the driver's
    * weaker rows-only check and a scalatest spec instead. */
  def oracleSql: Map[String, String] =
    RefParityQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles ++
      FunctionQueries.oracles ++ CurationQueries.oracles ++
      LexicalQueries.oracles
}
