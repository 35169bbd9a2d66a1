package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking: split each document's token
  * sequence into fixed-size windows with overlap — the step that turns
  * a curated corpus into model-ready training sequences (context-window
  * packing's upstream sibling; see Packing for the bin side).
  *
  * Window semantics: chunk i starts at token `i*stride` (stride =
  * chunkSize - overlap) and takes `chunkSize` tokens; generation stops
  * once a window reaches the end of the document, so every token is
  * covered, consecutive chunks share exactly `overlap` tokens, and no
  * tail chunk is a strict suffix of its predecessor. A document with
  * ≤ chunkSize tokens yields exactly one chunk.
  *
  * Scale shape: pure column algebra — tokenize, compute the chunk
  * count, `explode(sequence(...))`, `slice` — a narrow map with NO
  * shuffle at any corpus size. Output grows ×(n/stride) rows per doc,
  * but each row carries only (id, idx, count, md5), not the text, so
  * the operator can feed a downstream shuffle without amplifying
  * content bytes. Callers that need the chunk text re-`slice` from the
  * co-partitioned source instead of materializing it here.
  */
object Chunking {

  /** Emits (idCol, chunk_idx, chunk_tokens, chunk_md5) per window.
    * Tokenization is single-space split, matching the corpus-stats and
    * vocabulary queries (and their DuckDB oracles) byte-for-byte. */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap")
    val stride = chunkSize - overlap
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // windows: 1 when n <= chunkSize, else ceil((n - chunkSize)/stride) + 1
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(ceil((n - lit(chunkSize)).cast("double") / lit(stride)).cast("long") + lit(1L))
    val chunk = slice(col("__toks"),
      (col("chunk_idx") * stride + 1).cast("int"), lit(chunkSize))
    df.select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        size(chunk).as("chunk_tokens"),
        md5(array_join(chunk, " ")).as("chunk_md5"))
  }

  /** The sentence relation: (idCol, sent_idx, start, end, n_tok,
    * sentence) under the pinned [[Sentences]] rule table. `start`/`end`
    * are 0-based char offsets (end-exclusive); the unterminated final
    * sentence closes at text end (UAX SB2 — same boundary-append
    * plumbing as [[cdcChunks]]). Empty/NULL documents emit no rows.
    *
    * Scale shape: ONE codegen'd boundary pass
    * ([[graft.functions.SentenceEnds]]) + row-local algebra — a narrow
    * map, no per-token explode, no shuffle at any corpus size. */
  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = length(col("__t"))
    val lastE = when(size(col("__e")) === 0, lit(0))
      .otherwise(element_at(col("__e"), size(col("__e"))))
    val tx = coalesce(col(textCol), lit(""))
    df.select(col(idCol), tx.as("__t"),
        graft.functions.SentenceEnds.sentence_ends(tx).as("__e"))
      .filter(n > 0)
      .withColumn("__ends",
        when(lastE < n, concat(col("__e"), array(n.cast("int"))))
          .otherwise(col("__e")))
      .select(col(idCol), col("__t"), col("__ends"),
        posexplode(col("__ends")).as(Seq("sent_idx", "e")))
      // previous boundary; +1 skips the single separating space (the
      // corpus-wide single-space token convention)
      .withColumn("start", when(col("sent_idx") === 0, lit(0))
        .otherwise(element_at(col("__ends"), col("sent_idx")) + 1))
      .withColumn("sentence",
        col("__t").substr(col("start") + 1, col("e") - col("start")))
      .select(col(idCol), col("sent_idx"), col("start"), col("e").as("end"),
        size(split(col("sentence"), " ")).as("n_tok"), col("sentence"))
  }

  /** Sentence-boundary chunking: greedily pack CONSECUTIVE sentences
    * into chunks of at most `maxTokens` tokens — a sentence that would
    * overflow the running chunk starts the next one; a single
    * over-budget sentence gets its own chunk (never split). Chunks
    * therefore never cut mid-sentence, the property sliding/CDC windows
    * can't give.
    *
    * Emits (idCol, chunk_idx, n_sentences, n_tok, chunk_md5). The
    * greedy fold is per-document and runs INSIDE the row as an
    * `aggregate` over the sentence-length array — same narrow no-
    * shuffle shape as [[sentences]]; nothing about the sequential rule
    * forces a cross-row pass. */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val n = length(col("__t"))
    val lastE = when(size(col("__e")) === 0, lit(0))
      .otherwise(element_at(col("__e"), size(col("__e"))))
    val tx = coalesce(col(textCol), lit(""))
    val ends = col("__ends")
    df.select(col(idCol), tx.as("__t"),
        graft.functions.SentenceEnds.sentence_ends(tx).as("__e"))
      .filter(n > 0)
      .withColumn("__ends",
        when(lastE < n, concat(col("__e"), array(n.cast("int"))))
          .otherwise(col("__e")))
      .withColumn("__sents",
        transform(sequence(lit(1), size(ends)), k => {
          val st = when(k === 1, lit(0))
            .otherwise(element_at(ends, k - 1) + 1)
          col("__t").substr(st + 1, element_at(ends, k) - st)
        }))
      .withColumn("__nts", transform(col("__sents"), s => size(split(s, " "))))
      // greedy fold: accumulator (current chunk c, tokens in it a,
      // per-sentence assignments o)
      .withColumn("__assign",
        aggregate(col("__nts"),
          struct(lit(0).as("c"), lit(0).as("a"),
            array().cast("array<int>").as("o")),
          (st, nt) => {
            val newChunk = st.getField("a") > 0 &&
              (st.getField("a") + nt > maxTokens)
            val c2 = when(newChunk, st.getField("c") + 1)
              .otherwise(st.getField("c"))
            struct(c2.as("c"),
              when(newChunk, nt).otherwise(st.getField("a") + nt).as("a"),
              concat(st.getField("o"), array(c2)).as("o"))
          },
          st => st.getField("o")))
      .select(col(idCol), col("__sents"), col("__nts"), col("__assign"),
        explode(sequence(lit(0), element_at(col("__assign"), -1)))
          .as("chunk_idx"))
      .withColumn("__chunk_text",
        array_join(transform(
          filter(zip_with(col("__sents"), col("__assign"),
            (s2, a) => struct(s2.as("s"), a.as("a"))),
            p => p.getField("a") === col("chunk_idx")),
          p => p.getField("s")), " "))
      .select(col(idCol), col("chunk_idx"),
        size(filter(col("__assign"), a => a === col("chunk_idx")))
          .as("n_sentences"),
        size(split(col("__chunk_text"), " ")).as("n_tok"),
        md5(col("__chunk_text")).as("chunk_md5"))
  }

  /** Content-defined chunking (LBFS/FastCDC family): boundaries from
    * [[graft.functions.CdcBoundaries]]' window-hash condition, so an
    * edit reshapes only the chunk it lands in — every later chunk
    * keeps its hash identity, which is what makes chunk-level dedup
    * survive drift (fixed windows lose all alignment after one
    * inserted byte).
    *
    * Emits (idCol, chunk_idx, start, len, chunk_md5); `start` is
    * 1-based, chunks tile the document exactly. Empty documents emit
    * no rows. Same scale shape as [[slidingChunks]]: one codegen'd
    * boundary pass + column algebra, narrow, no shuffle. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = length(col("__t"))
    val lastB = when(size(col("__b")) === 0, lit(0))
      .otherwise(element_at(col("__b"), size(col("__b"))))
    // append the document end as a final boundary unless one landed there
    df.select(col(idCol), col(textCol).as("__t"),
        graft.functions.CdcBoundaries.cdc_boundaries(col(textCol)).as("__b"))
      .withColumn("__ends",
        when(n === 0, array().cast("array<int>"))
          .otherwise(when(lastB < n, concat(col("__b"), array(n.cast("int"))))
            .otherwise(col("__b"))))
      .select(col(idCol), col("__t"), col("__ends"))
      .select(col(idCol), col("__t"), col("__ends"),
        posexplode(col("__ends")).as(Seq("chunk_idx", "e")))
      .withColumn("s", when(col("chunk_idx") === 0, lit(0))
        .otherwise(element_at(col("__ends"), col("chunk_idx"))))
      .select(col(idCol), col("chunk_idx"),
        (col("s") + 1).as("start"), (col("e") - col("s")).as("len"),
        md5(col("__t").substr(col("s") + 1, col("e") - col("s"))).as("chunk_md5"))
  }
}
