package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Q1 QueryRecord (56409-tika.xml:1846-1890): one SQL statement per
  * named route over the record set, each route name → result DataFrame.
  * The reference runs Calcite per-FlowFile; here the view is the whole
  * distributed record set and Spark SQL (a strict superset of the
  * exercised Calcite surface) plans each route.
  *
  * The input is materialized once (`persist`) when fanning out to
  * multiple routes so the scan+extract work isn't re-run per route —
  * NiFi gets this for free from its queues; Spark needs the explicit
  * cache (SURVEY.md §4.2 multi-route single-scan).
  */
object Router {
  val ViewName = "FLOWFILE"

  def routes(records: DataFrame, queries: Map[String, String],
             includeZeroRecordRoutes: Boolean = false,
             persistInput: Boolean = true): Map[String, DataFrame] = {
    val in = if (persistInput && queries.size > 1) records.persist() else records
    in.createOrReplaceTempView(ViewName)
    val planned = queries.map { case (name, sql) => name -> in.sparkSession.sql(sql) }
    // include-zero-record-flowfiles=false (56409-tika.xml:1836) drops
    // empty routes — only meaningful on materialization, so callers that
    // keep laziness pass includeZeroRecordRoutes=true.
    if (includeZeroRecordRoutes) planned
    else planned.filter { case (_, df) => !df.isEmpty }
  }

  /** The template's exact three-way sentiment routing
    * (56409-tika.xml:1847-1859). */
  val SentimentRoutes: Map[String, String] = Map(
    "good"    -> "SELECT * FROM FLOWFILE WHERE sentiment = 'POSITIVE'",
    "bad"     -> "SELECT * FROM FLOWFILE WHERE sentiment = 'NEGATIVE'",
    "neutral" -> "SELECT * FROM FLOWFILE WHERE sentiment = 'NEUTRAL'")
}
