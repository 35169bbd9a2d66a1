package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Q1 QueryRecord (56409-tika.xml:1846-1890): one SQL statement per
  * named route over the record set, each route name → result DataFrame.
  * The reference runs Calcite per-FlowFile; here the view is the whole
  * distributed record set and Spark SQL (a strict superset of the
  * exercised Calcite surface) plans each route.
  *
  * When fanning out to multiple routes the input should be scanned
  * once — NiFi gets this for free from its queues; Spark needs an
  * explicit cache. [[withRoutes]] brackets that cache (persist →
  * consume every route → unpersist) so it can't leak past the caller's
  * actions; plain [[routes]] stays lazy and cache-free, which is the
  * right shape when only one route is consumed.
  */
object Router {
  val ViewName = "FLOWFILE"

  def routes(records: DataFrame, queries: Map[String, String],
             includeZeroRecordRoutes: Boolean = false): Map[String, DataFrame] = {
    records.createOrReplaceTempView(ViewName)
    val planned = queries.map { case (name, sql) => name -> records.sparkSession.sql(sql) }
    // include-zero-record-flowfiles=false (56409-tika.xml:1836) drops
    // empty routes — only meaningful on materialization, so callers that
    // keep laziness pass includeZeroRecordRoutes=true.
    if (includeZeroRecordRoutes) planned
    else planned.filter { case (_, df) => !df.isEmpty }
  }

  /** Multi-route single-scan form (SURVEY.md §4.2): persists the input,
    * hands every route to `f` (which must run its actions inside), then
    * releases the cache — the bracket guarantees no leaked RDDs. */
  def withRoutes[A](records: DataFrame, queries: Map[String, String],
                    includeZeroRecordRoutes: Boolean = false)
                   (f: Map[String, DataFrame] => A): A = {
    val in = records.persist()
    try f(routes(in, queries, includeZeroRecordRoutes))
    finally in.unpersist()
  }

  /** The template's exact three-way sentiment routing
    * (56409-tika.xml:1847-1859). */
  val SentimentRoutes: Map[String, String] = Map(
    "good"    -> "SELECT * FROM FLOWFILE WHERE sentiment = 'POSITIVE'",
    "bad"     -> "SELECT * FROM FLOWFILE WHERE sentiment = 'NEGATIVE'",
    "neutral" -> "SELECT * FROM FLOWFILE WHERE sentiment = 'NEUTRAL'")
}
