package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's public query catalog is assembled from per-family modules
  * (graft.queries.*); each query name maps to a `(SparkSession, sfDir) =>
  * DataFrame` and, where ANSI-SQL-expressible, a DuckDB oracle with identical
  * column names, types, and ordering.
  */
object SparkEntry {
  /** Flagship query (SURVEY.md §7.3: TPC-H-Q1-shaped scan→filter→agg→sort)
    * on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Scalars.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Temporal.queries ++
      Multimodal.queries ++ ScaleOps.queries ++ Nested.queries ++
      Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Scalars.oracles ++ TextOps.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Temporal.oracles ++
      Multimodal.oracles ++ ScaleOps.oracles ++ Nested.oracles ++
      Graph.oracles
}
