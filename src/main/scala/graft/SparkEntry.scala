package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator key from SURVEY §2 registers here: a DataFrame
  * builder in `queries` and (when DuckDB-expressible) matching ANSI
  * SQL in `oracleSql`. Builders live in `graft.ops.*` by category.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.qAggGroupby(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Windows.queries ++ ops.Aggregates.queries ++
    ops.Scalars.queries ++ ops.Streaming.queries ++ ops.LlmOps.queries ++
    ops.TrainingOps.queries ++ ops.Pipeline.queries ++ ops.Corpus.queries ++
    ops.Graph.queries ++ ops.Clustering.queries ++ ops.Storage.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Windows.oracle ++ ops.Aggregates.oracle ++
    ops.Scalars.oracle ++ ops.Streaming.oracle ++ ops.LlmOps.oracle ++
    ops.TrainingOps.oracle ++ ops.Pipeline.oracle ++ ops.Corpus.oracle ++
    ops.Graph.oracle ++ ops.Clustering.oracle ++ ops.Storage.oracle
}
