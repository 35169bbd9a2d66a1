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
}
