package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by the operator modules under graft.queries;
  * each key appears in `queries` and (when SQL-expressible) in
  * `oracleSql` with identical column names/aliases so the driver's
  * DuckDB hash-compare lines up.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full document pipeline (extract-shaped analogue):
    * sentiment tagging → per-route aggregate — exercises scan, codegen
    * expressions, grouping, and ordering in one plan. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_doc_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ExtQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.RetrievalQueries.queries ++
      graft.queries.IngestQueries.queries ++
      graft.queries.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.ExtQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.RetrievalQueries.oracleSql ++
      graft.queries.IngestQueries.oracleSql ++
      graft.queries.StreamQueries.oracleSql
}
