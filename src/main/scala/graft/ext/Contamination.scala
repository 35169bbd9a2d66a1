package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus contamination screen: for each candidate document, how
  * many of its distinct word n-grams appear anywhere in a benchmark
  * corpus — the train/test-overlap check a training-data pipeline runs
  * before a corpus ships (dedup's cross-corpus, asymmetric sibling:
  * containment against a reference set, not pairwise similarity).
  *
  * Scale shape (100 TB): benchmark suites are tiny next to a training
  * corpus, so the benchmark's distinct n-grams are hashed to 8-byte
  * keys (xxhash64 — same collision-is-~0 contract as
  * [[Dedup.jaccardPairs]]) and broadcast; the candidate side is a scan
  * → explode → map-side join → partial-agg pipeline with NO shuffle of
  * document content — the only exchange moves (id, two counts). For a
  * benchmark too big to broadcast, pass broadcastBench=false and the
  * identical plan runs as a hash-partitioned join on the 8-byte key.
  */
object Contamination {

  /** Per-candidate (n_sh, n_hit, contaminated) where contaminated means
    * ≥ `threshPct`% of the doc's distinct n-grams occur in the
    * benchmark. The flag compares integers (n_hit·100 ≥ n_sh·threshPct)
    * so engines can't disagree on float rounding. Documents with fewer
    * than n tokens have no n-grams and are absent from the output. */
  def screen(candidates: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String, n: Int = 3,
             threshPct: Int = 10, broadcastBench: Boolean = true): DataFrame = {
    val cand = Dedup.hashedShingleRows(candidates, idCol, textCol, n)
      .withColumnRenamed("s", "k")
    val benchRaw = Dedup.hashedShingleRows(benchmark, idCol, textCol, n)
      .select(col("s").as("k")).distinct()
      .withColumn("hit", lit(1))
    val bench = if (broadcastBench) broadcast(benchRaw) else benchRaw
    cand.join(bench, Seq("k"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_hit"))
      .select(col("id"), col("n_sh"), col("n_hit"),
        (col("n_hit") * 100 >= col("n_sh") * threshPct).as("contaminated"))
  }
}
