package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregation at scale.
  *
  * A single grouping key holding a large fraction of 100 TB funnels its
  * rows through one reducer. [[saltedAgg]] runs the classic two-phase
  * form: aggregate on (key, salt) — spreading the hot key over
  * `saltBuckets` reducers — then re-aggregate on key. Results are
  * identical to the direct groupBy for any re-aggregable function (the
  * oracle checks exactly that); AQE's skew handling covers joins, this
  * covers aggregations whose partials are still too hot.
  *
  * The salt is `pmod(hash(salt source), buckets)` — deterministic from
  * row content, so re-runs and retries stay stable.
  */
object Skew {

  /** Two-phase salted sum/count aggregate, equal to
    * `df.groupBy(key).agg(sum(valueCol), count(*))`. */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: Column,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }
}
