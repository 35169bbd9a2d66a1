package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dolma-shaped TAG-ONCE / MIX-MANY curation (Soldaini et al. 2024,
  * "Dolma: an Open Corpus of Three Trillion Tokens..." — the public
  * tagger/mixer architecture): per-document quality ATTRIBUTES are
  * computed once and persisted as their own relation beside the
  * corpus; a MIX is then any predicate over the attribute columns,
  * joined back to the text by id. The decoupling is the point at
  * 100 TB — retuning thresholds or swapping the tagger set costs one
  * narrow (doc_id-keyed) join against the small attributes relation,
  * never a re-tag of the corpus text, and taggers added later append
  * columns without touching the existing ones.
  *
  * Taggers composed here (all established operators of this engine):
  * token count, heuristic quality (fixed-point — [[TextStats]]),
  * language id ([[TextStats.langIdCol]]), the Gopher structural gate
  * ([[CurationFilters.structuralKeepCol]]), and the linear classifier
  * ([[LinearGate]]). One staged scan computes them all; the persisted
  * relation is ~5 columns × |corpus| rows, sorted by doc_id for
  * row-group pruning on id-range probes.
  *
  * Build-once mechanics are the [[Bm25.ensureIndex]] pattern:
  * content-signature-keyed directory, `_SUCCESS` guard, same-corpus
  * sibling GC, same SINGLE-WRITER assumption (see that scaladoc).
  */
object Attributes {

  /** Deterministic attributes location: corpus path + content
    * signature (a regenerated corpus keys to a NEW dir). */
  def attrDirFor(corpusDir: String,
                 root: String = sys.props("java.io.tmpdir")): String =
    s"$root/${Ivf.indexPrefix("graft_attrs_v1", corpusDir)}_${Ivf.md5hex(Ivf.contentSig(corpusDir), 8)}"

  /** One tagging pass over (doc_id, text): every tagger's signal in a
    * staged projection (token arrays materialize before their
    * interpreted-lambda consumers — the LinearGate trap). */
  def tagFrame(docs: DataFrame): DataFrame = {
    val text = coalesce(col("text"), lit(""))
    val staged = docs
      .select(col("doc_id"), text.as("__t"),
        filter(split(text, "\\s+"), w => w =!= "").as("__ws"))
      .select(col("doc_id"), col("__t"), col("__ws"),
        LinearGate.featsCol(col("__ws")).as("__fs"))
      .select(col("doc_id"), col("__t"), col("__ws"),
        size(col("__ws")).as("__nw"),
        size(col("__fs")).cast("long").as("__nf"),
        LinearGate.sumWeightCol(col("__fs")).as("__sw"))
    staged.select(
      col("doc_id"),
      col("__nw").as("n_words"),
      TextStats.qualityIntCol(col("__t")).cast("long").as("quality_q4"),
      TextStats.langIdCol(col("__t")).as("lang"),
      CurationFilters.structuralKeepFromTokens(col("__ws"), col("__t"))
        .as("gopher_keep"),
      (col("__sw") > lit(LinearGate.Threshold) * col("__nf")).as("clf_keep"))
  }

  /** Persist the attributes relation; `_SUCCESS`-guarded no-op when it
    * already exists. Single-writer (see [[ArtifactDir]]). */
  def ensureAttributes(docs: DataFrame, dir: String): Unit =
    ArtifactDir.ensure(docs.sparkSession, dir, "attrs",
      "^(graft_attrs_v1_[0-9a-f]+_).*".r) {
      tagFrame(docs)
        .sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite").parquet(s"$dir/attrs")
    }

  /** Streaming attributes maintenance (the Bm25.ingestIntoIndex
    * pattern): APPEND one micro-batch of new documents' attribute rows
    * to the persisted relation — the tag pass runs over the BATCH,
    * never the corpus, and every mix launched after the batch commits
    * sees the union. Ingested doc ids must be new (same contract as
    * the index ingest paths). */
  def ingestIntoAttributes(dir: String, batch: DataFrame): Unit =
    tagFrame(batch)
      .sortWithinPartitions(col("doc_id"))
      .write.mode("append").parquet(s"$dir/attrs")

  /** A MIX: join the persisted attributes back to the corpus by id and
    * keep rows satisfying `pred` (a predicate over attribute columns).
    * The plan reads the attrs parquet — no tagger re-runs, no text
    * tokenization; the only per-row work on text is whatever the
    * caller projects from it. */
  def mixed(spark: SparkSession, dir: String, docs: DataFrame,
            pred: Column): DataFrame =
    docs.join(spark.read.parquet(s"$dir/attrs"), Seq("doc_id"))
      .filter(pred)
}
