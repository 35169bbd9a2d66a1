package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload
  * of the LATEST right row with the same key and time ≤ the left row's
  * time (inclusive) — the lookup shape behind feature stores, slowly
  * changing dimensions and market-data alignment.
  *
  * Spark has no asof operator, and the naive range join
  * (`l.key = r.key AND r.t <= l.t` + per-left max) explodes to
  * |L|×|R| comparisons per key before aggregating. This is instead the
  * UNION-TAG form — the composition of existing operators that keeps
  * asof sub-quadratic and single-shuffle:
  *
  *   1. union left and right rows, tagged by side, right's payload
  *      packed in one nullable struct;
  *   2. one hash shuffle on the key (the only shuffle in the plan);
  *   3. within each key partition, sort by (time, side) — right sorts
  *      BEFORE left at equal times, which is what makes the join
  *      inclusive — and carry the last non-null payload struct forward
  *      with a running `last(ignoreNulls)` window;
  *   4. keep only left rows, unpack the struct.
  *
  * Cost: O((|L|+|R|) log) for the per-partition sort, payload moves
  * once; at 1000 executors the watermark-free window never
  * re-partitions. Left rows with no prior right row keep a null
  * payload (left-join semantics).
  *
  * Right rows must be unique per (key, time) — at equal (key, time)
  * the carried winner would otherwise be sort-nondeterministic; callers
  * dedupe first (`row_number` keep-one), as q_asof_join's corpus
  * guarantees.
  */
object AsofJoin {

  /** `direction`: "backward" (default) attaches the LATEST right row
    * with r.time ≤ l.time; "forward" attaches the EARLIEST right row
    * with r.time ≥ l.time — the same union-tag plan with the
    * per-partition sort reversed (descending time carries the nearest
    * FOLLOWING payload backward through the window). Identical cost
    * profile either way: one shuffle, one sort. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               payload: Seq[String], outPrefix: String = "asof_",
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"unknown asof direction: $direction")
    val internal = Set("__side", "__asof", "__carried")
    require(!(left.columns ++ right.columns).exists(internal),
      s"asofJoin uses internal columns ${internal.mkString(", ")}; rename the inputs' first")
    val extraLeft = left.columns.toSeq.filterNot(c => c == key || c == time)
    val leftSchema = left.schema
    val packed = struct(payload.map(col): _*)
    val lU = left.select(
      Seq(col(key), col(time), lit(1).as("__side")) ++
        extraLeft.map(col) :+
        lit(null).cast(right.select(packed).schema.head.dataType).as("__asof"): _*)
    val rU = right.select(
      Seq(col(key), col(time), lit(0).as("__side")) ++
        extraLeft.map(c => lit(null).cast(leftSchema(c).dataType).as(c)) :+
        packed.as("__asof"): _*)
    // right (side 0) sorts before left at EQUAL times in both
    // directions — that tie order is what makes the join inclusive
    val timeOrder = if (direction == "backward") col(time).asc else col(time).desc
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lU.unionByName(rU)
      .withColumn("__carried", last(col("__asof"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(
        Seq(col(key), col(time)) ++
          extraLeft.map(col) ++
          payload.map(c => col(s"__carried.$c").as(s"$outPrefix$c")): _*)
  }

  /** NEAREST as-of: attach the right row minimizing |r.time − l.time|
    * (ties → the earlier right row, deterministically) — the
    * attribution shape when an event may be explained by activity just
    * before OR just after it.
    *
    * Same union-tag skeleton, ONE shuffle still: the backward and
    * forward carries are two windows over the SAME key partitioning
    * (Catalyst reuses the Exchange; only a second in-partition sort is
    * added), the right row's time rides inside the packed struct, and
    * the closer of the two candidates wins per left row. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      time: String, payload: Seq[String],
                      outPrefix: String = "asof_"): DataFrame = {
    val internal = Set("__side", "__asof", "__b", "__f", "__n")
    require(!(left.columns ++ right.columns).exists(internal),
      s"asofJoinNearest uses internal columns ${internal.mkString(", ")}; rename the inputs' first")
    val extraLeft = left.columns.toSeq.filterNot(c => c == key || c == time)
    val leftSchema = left.schema
    val packed = struct(col(time).as("__t") +: payload.map(col): _*)
    val lU = left.select(
      Seq(col(key), col(time), lit(1).as("__side")) ++
        extraLeft.map(col) :+
        lit(null).cast(right.select(packed).schema.head.dataType).as("__asof"): _*)
    val rU = right.select(
      Seq(col(key), col(time), lit(0).as("__side")) ++
        extraLeft.map(c => lit(null).cast(leftSchema(c).dataType).as(c)) :+
        packed.as("__asof"): _*)
    val wB = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key))
      .orderBy(col(time).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lU.unionByName(rU)
      .withColumn("__b", last(col("__asof"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__asof"), ignoreNulls = true).over(wF))
    val db = col(time) - col("__b.__t")
    val df = col("__f.__t") - col(time)
    val chosen = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(db <= df, col("__b")) // tie → backward = the earlier right row
      .otherwise(col("__f"))
    carried.filter(col("__side") === 1)
      .withColumn("__n", chosen)
      .select(
        Seq(col(key), col(time)) ++
          extraLeft.map(col) ++
          payload.map(c => col(s"__n.$c").as(s"$outPrefix$c")): _*)
  }
}
