package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document repeated-segment removal — the CCNet/RefinedWeb
  * "line-level dedup" curation step: segments that recur across many
  * documents (headers, footers, navigation chrome, license
  * boilerplate) are cut from EVERY document, and the surviving
  * segments are reassembled in order. This is distinct from
  * document-level dedup (whole docs dropped — `Dedup`) and from
  * benchmark decontamination (only spans shared with a benchmark cut —
  * `Contamination.excise`): here the removal signal is the corpus
  * itself, via per-segment document frequency.
  *
  * Documents are segmented into fixed-width non-overlapping token
  * windows (the corpus carries no newlines; splitting on '\n' is the
  * one-line-per-segment special case of the same operator — pass the
  * pre-split lines as tokens). Deterministic segmentation keeps the
  * operator reproducible across runs, engines, and partitionings, so
  * a DuckDB oracle can mirror it 1:1.
  *
  * Scale shape (100 TB): segmentation is a narrow map (one generate
  * per doc). The document-frequency count moves only (xxhash64(seg),
  * id) pairs — 16-byte rows, never the text. The boilerplate set
  * (df ≥ maxDf) is by construction the FREQUENT minority of distinct
  * segments, so it broadcasts, and the removal is a broadcast
  * LEFT ANTI join — candidate text never shuffles for the filter.
  * The single full-width shuffle is the final reassembly groupBy(id),
  * inherent to re-gluing documents. xxhash64 collisions merge two
  * distinct segments with probability ≈ N²/2^65 — at 10^12 segments a
  * handful of rare segments would be over-dropped, an acceptable
  * curation error mode (never a correctness error on the df count
  * itself, which keys on the same hash both sides).
  */
object Boilerplate {

  /** (id, seg, segtext) — non-overlapping `segTokens`-token windows in
    * document order. Map-only; null text reads as empty. */
  private[ext] def segments(df: DataFrame, idCol: String, textCol: String,
                            segTokens: Int): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive: $segTokens")
    // token array staged as a column before the transform slices into
    // it (interpreted-HOF re-evaluation — the LinearGate trap)
    df.select(col(idCol).as("id"),
        split(coalesce(col(textCol), lit("")), " ").as("__toks"))
      .select(col("id"),
        posexplode(segmentArray(col("__toks"), segTokens))
          .as(Seq("seg", "segtext")))
  }

  /** Removes every segment whose corpus-wide document frequency is
    * ≥ `maxDf` and reassembles the survivors in order. Emits one row
    * per input document: (id, clean_text, kept_segs, total_segs) —
    * fully-boilerplate documents survive with clean_text = '' so the
    * caller decides whether to drop them (row-count stability makes
    * the gate auditable). */
  def dropRepeatedSegments(df: DataFrame, idCol: String, textCol: String,
                           segTokens: Int, maxDf: Long): DataFrame = {
    // consumed twice (document-frequency count AND the anti-join); the
    // Generate deliberately re-runs per consumer rather than persist:
    // segmentation is a narrow map, and caching the exploded
    // (id, seg, segtext, h) relation would pin text-width blocks for
    // the life of the session (SCALE.md's documents-scale persists
    // carry only (doc_id)/(doc_id, norm), never exploded relations)
    val segs = segments(df, idCol, textCol, segTokens)
      .withColumn("h", xxhash64(col("segtext")))
    // document frequency over 16-byte (h, id) rows: two exchanges —
    // the distinct pre-pass partitions on (h, id), the count on h
    // (HashPartitioning(h, id) does NOT satisfy clustering by h alone)
    // — but both move only the compact hashed rows, never the text
    val docFreq = segs.select(col("h"), col("id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val boiler = docFreq.filter(col("df") >= maxDf).select(col("h"))
    // broadcast anti-join: text stays put; only the small boilerplate
    // set moves
    val kept = segs.join(broadcast(boiler), Seq("h"), "left_anti")
    // per-doc totals need no explode: the segment count IS
    // ceil(|tokens|/segTokens) — a map-only scalar per document
    // (saves a third full Generate + aggregation pass over the corpus)
    val arr = split(coalesce(col(textCol), lit("")), " ")
    val totals = df.select(col(idCol).as("id"),
      ceil(size(arr) / lit(segTokens.toDouble)).cast("long").as("total_segs"))
    val clean = kept.groupBy(col("id")).agg(
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("seg"), col("segtext")))),
        x => x.getField("segtext"))).as("clean_text"),
      count(lit(1)).as("kept_segs"))
    totals.join(clean, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_segs"), lit(0L)).as("kept_segs"),
        col("total_segs"))
  }

  /** Array of non-overlapping `segTokens`-token segments of a
    * MATERIALIZED token-array column, in document order — the column
    * form of [[segments]]' grid for map-only WITHIN-document operators
    * (no Generate, no shuffle). Takes the token array, not the text:
    * the transform lambda slices into `toks` per segment, and HOF
    * lambdas re-evaluate their operand expression per element — an
    * inline split() here would re-tokenize the document once per
    * segment. Callers project `split(text, " ")` into its own column
    * first. split() never yields an empty array (worst case [""]), so
    * the segment count ceil(|toks|/segTokens) is ≥ 1 and the
    * sequence() endpoints stay ascending. */
  def segmentArray(toks: Column, segTokens: Int): Column = {
    require(segTokens > 0, s"segTokens must be positive: $segTokens")
    val nSeg = ceil(size(toks) / lit(segTokens.toDouble)).cast("int")
    transform(sequence(lit(0), nSeg - 1),
      j => concat_ws(" ", slice(toks, j * segTokens + 1, lit(segTokens))))
  }

  /** Keep-first-occurrence distinct over a string array — the
    * WITHIN-document repeated-paragraph removal (copy-paste tails,
    * templated page chrome repeated inside one page). Where
    * [[dropRepeatedSegments]] cuts segments frequent ACROSS documents,
    * this keeps each document's own first occurrence and drops its
    * later repeats, preserving order.
    *
    * `array_distinct` already has exactly these semantics (keep-first,
    * order-preserving) and is the engine-native form; spelled here via
    * the same codegen'd builtin. Map-only: the whole operator is one
    * projection — per-doc work is O(k²) string compares for k
    * segments, the right trade while k stays bounded (a 100-page doc
    * at 6-token segments is k≈10⁴ → use the explode+window form
    * instead; curation corpora cap document length far below that). */
  def keepFirstDistinct(segs: Column): Column = array_distinct(segs)
}
