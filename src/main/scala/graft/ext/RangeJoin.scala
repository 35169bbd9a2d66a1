package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: an equi-join plan for a range predicate.
  *
  * The reference's QueryRecord accepts arbitrary Calcite SQL
  * (`/root/reference/56409-tika.xml:1846-1860`), which includes
  * inequality join predicates. Spark plans a bare
  * `p.t BETWEEN i.lo AND i.hi` join condition as
  * BroadcastNestedLoopJoin — O(|P|·|I|) comparisons per executor and a
  * full broadcast of one side — a scale-killer once neither side fits
  * in memory.
  *
  * This operator rewrites a point-in-interval join into an equi-join on
  * coarse time buckets:
  *
  *   - the POINT side gets exactly ONE bucket, `floorDiv(t, width)`;
  *   - the INTERVAL side explodes into every bucket its [lo, hi] span
  *     covers, `sequence(floorDiv(lo, w), floorDiv(hi, w))`.
  *
  * Because a point lives in exactly one bucket, a (point, interval)
  * pair can meet in at most one joined row — no dedup pass is needed —
  * and the exact BETWEEN predicate refines candidates to matches.
  *
  * Cost model: the interval side replicates ×(span/width + 1); pick
  * `bucketWidth` at or above the typical interval span so the blow-up
  * stays ≤ 2×. What scale buys back: the join becomes a standard
  * shuffled (or broadcast) hash join on (keys…, bucket) — partition
  * pruning, AQE skew splitting, and map-side broadcast all apply, none
  * of which a nested-loop plan gets. RangeChunkBloomSpec asserts the executed
  * plan contains a hash join and NO BroadcastNestedLoopJoin.
  */
object RangeJoin {

  /** floor(`name` / w) as a long column in pure INTEGRAL arithmetic:
    * `div` alone truncates toward zero, so pmod (always non-negative)
    * first lands x on its floor multiple — correct for negative x —
    * and the exact-multiple division never rounds, where a
    * double-division form would drift above 2^53 (epoch NANOS are
    * ~1.7e18, well past it). */
  private def floorDivCol(name: String, w: Long): Column =
    expr(s"((`$name` - pmod(`$name`, ${w}L)) div ${w}L)")

  /** Joins `points` to `intervals` where the `keys` columns match and
    * `points(pointCol)` ∈ [loCol, hiCol], inclusive on both ends.
    * The three range columns must be integral (cast timestamps to epoch
    * micros first); emits all columns of both inputs (the interval
    * side's key columns appear once). */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val bucket = "__rj_bucket"
    require(!points.columns.contains(bucket) && !intervals.columns.contains(bucket),
      s"inputs must not carry a $bucket column")
    val p = points.withColumn(bucket, floorDivCol(pointCol, bucketWidth))
    val i = intervals.withColumn(bucket,
      explode(sequence(floorDivCol(loCol, bucketWidth),
        floorDivCol(hiCol, bucketWidth))))
    p.join(i, keys :+ bucket)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bucket)
  }
}
