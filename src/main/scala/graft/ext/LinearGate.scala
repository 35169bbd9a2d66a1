package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-shaped LINEAR quality classifier inference — the
  * model-based filtering stage of the published curation pipelines
  * (DCLM's fastText quality filter, FineWeb-Edu's classifier gate;
  * Joulin et al. 2016 "Bag of Tricks for Efficient Text
  * Classification" for the architecture): hash every unigram and
  * bigram into one of [[Buckets]] feature buckets, average the
  * buckets' weights, keep documents whose mean clears the threshold.
  * Complements the rule gates ([[CurationFilters]]) with the learned
  * half of the DCLM recipe.
  *
  * The weight TABLE here is a deterministic closed-form stand-in
  * (bucket → integer in [-1001, 1001], [[weightOf]]) so the oracle
  * can recompute it; the engine mechanics are exactly a trained
  * model's: the table is bounded model metadata ([[Buckets]] ints —
  * broadcast-sized, like the IVF centroids or the DSIR bucket
  * models), scoring is pure map-side column algebra (codegen'd
  * split/transform/aggregate, no shuffle, no UDF), and the keep
  * decision compares INTEGERS (Σw > θ·N cross-multiplied) so no
  * engine's float rounding can flip the gate; only the REPORTED mean
  * uses the repo's floor(x·1e4+0.5)/1e4 display contract. At 100 TB
  * this runs at scan speed: the model rides the closure, the corpus
  * never shuffles, and the gate composes with pushdown like any
  * other per-row predicate.
  */
object LinearGate {

  /** Feature-hash table size. Real deployments use 2^20+; the
    * mechanics (and the oracle algebra) are size-independent. */
  val Buckets = 1024

  /** Keep iff mean bucket weight exceeds this (integer θ in the
    * Σw > θ·N cross-multiplied gate). */
  val Threshold = 25L

  /** Knuth-style multiplicative scramble of the bucket id into a
    * deterministic signed weight — the stand-in for a trained row of
    * the weight table. */
  private def weightCol(bucket: Column): Column =
    (bucket * 2654435761L) % 2003L - 1001L

  /** md5-prefix feature hash — the cross-engine selector idiom
    * ([[Sampling.selector]] precedent): DuckDB mirrors it as
    * `CAST('0x' || substr(md5(g),1,8) AS BIGINT) % Buckets`. */
  private def bucketCol(g: Column): Column =
    conv(substring(md5(g.cast("binary")), 1, 8), 16, 10).cast("long") % Buckets

  /** Unigram ∪ bigram feature list over an ALREADY-MATERIALIZED token
    * array column. The bigram sequence is guarded: `sequence(1,
    * size-1)` on a 0/1-token document would DESCEND (the Bpe.scala
    * trap) — short documents get unigrams only.
    *
    * Takes a column REFERENCE, not the split expression: `element_at`
    * inside the transform lambda re-evaluates its array operand per
    * index, so indexing into an inline split/filter tree would
    * re-tokenize the document once per bigram — O(words²) per row
    * (measured: 23 s → 1.6 s at sf0.1 for [[scoreFrame]]). Callers
    * must project the token array into its own column first. */
  def featsCol(ws: Column): Column = {
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), lit("_"), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(ws, bigrams)
  }

  /** Σ bucket weight over a MATERIALIZED feature-array column — the
    * classifier's inner sum, exposed for composed taggers
    * ([[Attributes]]). Same staging contract as [[featsCol]]. */
  private[ext] def sumWeightCol(fs: Column): Column =
    aggregate(fs, lit(0L), (acc, g) => acc + weightCol(bucketCol(g)))

  /** (doc_id, n_feats, mean_w, keep) — classifier inference over
    * `textCol`. Map-only; one pass. */
  def scoreFrame(df: DataFrame, textCol: String): DataFrame = {
    val tokens = filter(
      split(coalesce(col(textCol), lit("")), "\\s+"), w => w =!= "")
    // three materialization steps so no array-consuming lambda ever
    // re-evaluates an expensive producer expression (see featsCol)
    val staged = df
      .select(col("doc_id"), tokens.as("__ws"))
      .select(col("doc_id"), featsCol(col("__ws")).as("__fs"))
      .select(col("doc_id"), size(col("__fs")).cast("long").as("__n"),
        sumWeightCol(col("__fs")).as("__s"))
    staged.select(
      col("doc_id"),
      col("__n").cast("int").as("n_feats"),
      (floor(col("__s").cast("double") / greatest(col("__n"), lit(1L))
        * 1e4 + 0.5) / 1e4).as("mean_w"),
      (col("__s") > lit(Threshold) * col("__n")).as("keep"))
  }

  /** Driver-side mirror of the weight function — for specs. */
  private[ext] def weightOf(bucket: Long): Long =
    (bucket * 2654435761L) % 2003L - 1001L

  /** DuckDB mirror of [[scoreFrame]] over a relation exposing
    * (doc_id, text). */
  def scoreSql(rel: String): String =
    s"""SELECT doc_id,
       |  CAST(n AS INT) AS n_feats,
       |  floor(CAST(s AS DOUBLE) / greatest(n, 1) * 1e4 + 0.5) / 1e4 AS mean_w,
       |  s > $Threshold * n AS keep
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(fs) AS BIGINT) AS n,
       |    CAST(coalesce(list_sum(list_transform(fs, g ->
       |      ((CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % $Buckets)
       |        * 2654435761) % 2003 - 1001)), 0) AS BIGINT) AS s
       |  FROM (
       |    SELECT doc_id,
       |      list_concat(ws,
       |        CASE WHEN len(ws) >= 2
       |          THEN list_transform(range(1, len(ws)),
       |                 i -> ws[i] || '_' || ws[i + 1])
       |          ELSE CAST([] AS VARCHAR[]) END) AS fs
       |    FROM (
       |      SELECT doc_id,
       |        list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
       |          w -> w <> '') AS ws
       |      FROM $rel)))""".stripMargin
}
