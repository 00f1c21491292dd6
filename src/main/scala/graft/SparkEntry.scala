package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-area query registries; every entry in `queries`
  * that is SQL-expressible has a DuckDB oracle in `oracleSql` with
  * matching column names and a total output order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core read path: KNN with scores (SURVEY §3.1). */
  def entry(spark: SparkSession): DataFrame =
    queries("a2_knn_score")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.queries ++ CatalogQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ AnnQueries.queries ++
      MultimodalQueries.queries ++ EventQueries.queries ++
      RelationalQueries.queries ++ PipelineQueries.queries ++
      CurationQueries.queries ++ HybridQueries.queries ++
      ModelQueries.queries ++ WebQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used only for non-SQL-expressible ops). */
  def oracleSql: Map[String, String] =
    VectorQueries.oracle ++ CatalogQueries.oracle ++
      TextQueries.oracle ++ DedupQueries.oracle ++ AnnQueries.oracle ++
      MultimodalQueries.oracle ++ EventQueries.oracle ++
      RelationalQueries.oracle ++ PipelineQueries.oracle ++
      CurationQueries.oracle ++ HybridQueries.oracle ++
      ModelQueries.oracle ++ WebQueries.oracle
}
