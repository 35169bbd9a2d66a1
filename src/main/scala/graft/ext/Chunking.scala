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
