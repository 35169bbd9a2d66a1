package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamPipeline

/** Streaming-operator queries. q_stream_window runs through the REAL
  * Structured Streaming engine (file source → stateful aggregation →
  * memory sink, drained synchronously); its oracle is the equivalent
  * batch SQL — streaming and batch must agree on bounded input
  * (Spark's own unification contract). Timestamps stay in integer
  * epoch units end-to-end (the source column is TIMESTAMP(NANOS)).
  */
object StreamQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_window" -> ((s, d) => {
      val agg = StreamPipeline.windowedCounts(StreamPipeline.readEvents(s, d))
      StreamPipeline.runToCompletion(s, agg, s"stream_window_${System.identityHashCode(d)}")
        // terminal decimal → double for engine-stable hashing (exact value)
        .withColumn("total_value", col("total_value").cast("double"))
        .orderBy(col("window_start_us"), col("event_type"))
    }),

    "q_sessionize" -> ((s, d) => {
      StreamPipeline.sessionize(Tables.events(s, d))
        .toDF()
        .orderBy(col("user_id"), col("session_idx"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_stream_window" ->
      """SELECT cast(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
        |  event_type, count(*) AS n,
        |  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,
    "q_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, epoch_ns(ts) AS tns,
        |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
        |           OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)) > 1800000000000
        |         OR lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, tns,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY tns
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM marked)
        |SELECT user_id, cast(session_idx AS INT) AS session_idx,
        |  count(*) AS n_events,
        |  cast((max(tns) - min(tns)) // 1000000000 AS BIGINT) AS duration_sec
        |FROM sessions GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin
  )
}
