package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: assign each document
  * to a fixed-token-budget bin (boundary packing — documents are never
  * split; a bin closes when the running token count crosses the
  * budget). Deterministic: bins follow the (stratum, id) order, so the
  * same corpus always packs identically.
  *
  * Scale shape (100 TB): the running sum is a window per stratum
  * (shard/source), NOT a global cumulative sum — strata pack
  * independently and in parallel, and the window input is just
  * (id, token count), never document content. Stratum cardinality
  * bounds parallelism; for few huge strata, pre-split them with
  * [[Sampling.selector]] buckets first.
  */
object Packing {

  /** (id, stratum, n_tok, cum, bin): `bin` is the zero-based index of
    * the token-budget bin the document starts in; `cum` the inclusive
    * running token count within the stratum. */
  def packByStratum(df: DataFrame, idCol: String, strataCol: String,
                    textCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(strataCol),
        size(split(col(textCol), " ")).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(cum - n_tok) div $budget"))
  }
}
