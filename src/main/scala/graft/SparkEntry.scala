package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog lives in `graft.queries.*`; each map entry is one
  * operator from SURVEY.md §2's inventory (or a training-data-pipeline
  * extension), paired with DuckDB-runnable oracle SQL where the
  * semantics are SQL-expressible.
  */
object SparkEntry {
  import graft.queries._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinStar(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ TimeSeries.queries ++ Curation.queries ++
      RoundTrip.queries ++ Graph.queries ++ Layout.queries ++
      Spectral.queries ++ Factorize.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ TimeSeries.oracles ++ Curation.oracles ++
      RoundTrip.oracles ++ Graph.oracles ++ Layout.oracles ++
      Spectral.oracles ++ Factorize.oracles
}
