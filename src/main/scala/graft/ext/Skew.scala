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
    require(!df.columns.contains("_salt"),
      "saltedAgg uses an internal '_salt' column; rename the input's first")
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }

  /** Skew-safe inner equi-join of a skewed fact side against a small
    * dimension side: the fact side salts its key `saltBuckets` ways
    * (deterministic content hash), the dimension side REPLICATES once
    * per salt (explode of a literal range — |dim|×buckets rows, cheap
    * because dims are small), and the join key becomes (key, salt) —
    * a hot key's rows now land on `saltBuckets` reducers instead of
    * one. Result is row-identical to the plain join (the oracle checks
    * that). AQE's skew-join split covers sort-merge plans after the
    * fact; this form PRE-spreads the hash, which also works for the
    * broadcast-ineligible dim-too-big-to-broadcast middle ground. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 saltBuckets: Int = 16): DataFrame = {
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "saltedJoin uses an internal '_salt' column; rename the inputs' first")
    val salted = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** The AQE-native counterpart to [[saltedJoin]]: declare the plain
    * sort-merge equi-join and let `OptimizeSkewedJoin` split the hot
    * partitions AT RUNTIME from the actual shuffle statistics — no
    * salt column, no dim replication, and the split adapts to whatever
    * key turns out hot in production rather than the one you predicted
    * at write time. The `merge` hint pins the shuffled plan so the
    * demo is the 100 TB shape (a dim too big to broadcast);
    * ScaleTechniquesSpec executes this under skew-scaled thresholds
    * and asserts the finalized plan carries `skew=true`. Prefer this
    * form when AQE is on and the skew is join-side; [[saltedAgg]]
    * remains the answer for skewed AGGREGATIONS, which AQE's
    * skew-join rule does not cover. */
  def aqeJoin(fact: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    fact.hint("merge").join(dim, Seq(keyCol))
}
