package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The training-data-pipeline extension operators (BASELINE.json north
  * star) — aggregator over the family files the round-12 split carved
  * out of the former 3,600-line object: dedup, similarity search, text
  * analysis, shard ingest, scale techniques, multimodal, curation
  * funnels. Keys and oracle text are byte-identical to the pre-split
  * inventory; shared fixtures live in [[ExtHelpers]].
  */
object ExtQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DedupQueries.queries ++
      AnnQueries.queries ++
      TextQualityQueries.queries ++
      ShardStatsQueries.queries ++
      ScaleOpsQueries.queries ++
      MultimodalQueries.queries ++
      FunnelQueries.queries

  def oracleSql: Map[String, String] =
    DedupQueries.oracleSql ++
      AnnQueries.oracleSql ++
      TextQualityQueries.oracleSql ++
      ShardStatsQueries.oracleSql ++
      ScaleOpsQueries.oracleSql ++
      MultimodalQueries.oracleSql ++
      FunnelQueries.oracleSql
}
