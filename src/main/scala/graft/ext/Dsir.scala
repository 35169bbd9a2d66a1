package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al.,
  * NeurIPS 2023): select pretraining documents whose hashed-n-gram
  * feature distribution looks like a TARGET domain. Each token hashes
  * into a small bucket space; a raw-corpus and a target-domain bucket
  * unigram model are estimated with Laplace smoothing; a document's
  * importance score is the mean per-token log-likelihood ratio
  * log(p_target(b)/p_raw(b)); the top-k scores are the selected subset.
  *
  * Determinism: the bucket hash is the repo's md5 selector arithmetic
  * (identical in DuckDB), per-token ratios go through the same
  * round-to-6-decimals → exact-decimal-sum discipline as the LM scoring
  * queries (order-free partial aggregation), and the terminal mean uses
  * the floor display contract — so scores are bit-identical cross-engine
  * and the selection threshold cannot flip.
  *
  * Scale shape: the two bucket models aggregate to `nBuckets` rows
  * (constant, default 64) and broadcast back onto the token stream —
  * map-side join, no token shuffle; the per-doc aggregation shuffles
  * compact (doc_id, decimal) rows; selection avoids any global window
  * by computing the k-th (score, doc_id) boundary via distributed
  * TakeOrdered and broadcasting that single row back as a filter
  * threshold. At 100 TB nothing but per-doc score rows ever moves.
  */
object Dsir {

  val DefaultBuckets = 64

  /** Deterministic token → bucket hash (first 8 md5 hex digits mod B —
    * the Sampling selector arithmetic, reproducible in ANSI SQL). */
  def bucketCol(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok.cast("binary")), 1, 8), 16, 10)
      .cast("long") % nBuckets

  /** Per-document importance scores: (doc_id, lang, n_tok, logratio)
    * with logratio already through the floor display contract.
    * `targetPred` marks the target-domain rows (e.g. lang = 'en'). */
  def importanceScores(docs: DataFrame, textCol: String,
                       targetPred: Column,
                       nBuckets: Int = DefaultBuckets): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"), targetPred.as("is_tgt"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("bucket", bucketCol(col("tok"), nBuckets))
    // raw and target bucket counts in ONE pass over the token stream
    val counts = toks.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("c_tgt"))
    val totals = counts.agg(
      sum(col("c_raw")).as("n_raw"), sum(col("c_tgt")).as("n_tgt"))
    // Laplace(+1) smoothing keeps empty target buckets finite
    val model = counts.crossJoin(broadcast(totals)).select(
      col("bucket"),
      ((col("c_tgt") + 1).cast("double") / (col("n_tgt") + nBuckets).cast("double")).as("p_tgt"),
      ((col("c_raw") + 1).cast("double") / (col("n_raw") + nBuckets).cast("double")).as("p_raw"))
    val lr6 = round(log(col("p_tgt") / col("p_raw")), 6).cast("decimal(14,6)")
    toks.join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tok"), sum(lr6).as("slr"))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        (floor(col("slr").cast("double") / col("n_tok") * 1e4 + 0.5) / 1e4)
          .as("logratio"))
  }

  /** Mark the top-k scores selected WITHOUT a global window: the k-th
    * (logratio, doc_id) pair is found by distributed top-k and
    * broadcast back as a boundary filter. Ties are impossible past the
    * boundary because doc_id breaks them totally. */
  def selectTopK(scored: DataFrame, k: Int): DataFrame = {
    val kth = scored.orderBy(col("logratio").desc, col("doc_id").asc)
      .limit(k)
      .agg(max(struct((-col("logratio")).as("neg_lr"), col("doc_id").as("tid")))
        .as("b"))
      .select((-col("b.neg_lr")).as("t"), col("b.tid").as("tid"))
    // max over struct(-logratio, doc_id) = the LAST row of the top-k
    // under (logratio DESC, doc_id ASC) — the selection boundary.
    // k = 0 (or an empty scored input reaching the agg) leaves the
    // boundary row NULL; the predicate would then evaluate to NULL on
    // every row and a consumer's !selected / count would silently drop
    // them — coalesce pins "no boundary" to selected = false.
    scored.crossJoin(broadcast(kth))
      .withColumn("selected",
        coalesce(
          col("logratio") > col("t") ||
            (col("logratio") === col("t") && col("doc_id") <= col("tid")),
          lit(false)))
      .drop("t", "tid")
  }
}
