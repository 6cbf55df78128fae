package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the operator battery from graft.queries.*; each
  * key has a matching DuckDB-runnable oracle in `oracleSql` unless the
  * operator is not SQL-expressible (driver then does a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.FastdbOps.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.SqlSurface.queries ++
      graft.queries.Corpus.queries ++ graft.queries.Quality.queries ++
      graft.queries.Search.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.FastdbOps.oracles ++
      graft.queries.Pipeline.oracles ++ graft.queries.SqlSurface.oracles ++
      graft.queries.Corpus.oracles ++ graft.queries.Quality.oracles ++
      graft.queries.Search.oracles
}
