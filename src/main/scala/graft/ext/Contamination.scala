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

  /** STATELESS form of [[screen]] for streaming candidates: the
    * benchmark's gram hashes are collected once to a sorted array
    * (driver-held model data, the same "benchmark is tiny next to the
    * corpus" premise the broadcast join rests on) and membership runs
    * as a binary search inside one map-only pass — no stream-side
    * join, no aggregation state, so the query runs in Append mode
    * with zero state store and ANY micro-batch split emits identical
    * rows. Same output contract as [[screen]] (gram construction and
    * hashes shared via Dedup, so the two forms cannot drift). */
  def screenStateless(candidates: DataFrame, benchmark: DataFrame,
                      idCol: String, textCol: String, n: Int = 3,
                      threshPct: Int = 10): DataFrame = {
    val spark = candidates.sparkSession
    val benchArr: Array[Long] = Dedup.hashedShingleSet(benchmark, textCol, n)
      .orderBy(col("g")).collect().map(_.getLong(0))
    val bc = spark.sparkContext.broadcast(benchArr)
    val hitCount = udf { (grams: Seq[Long]) =>
      val arr = bc.value
      var h = 0L
      grams.foreach(g => if (java.util.Arrays.binarySearch(arr, g) >= 0) h += 1)
      h
    }
    val toks = col("__toks") // staged first — see Dedup.rawShingleRows
    val grams = array_distinct(transform(Dedup.gramStartIdx(toks, n),
      i => xxhash64(Dedup.gramAt(toks, i, n))))
    candidates
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), grams.as("__g"))
      .filter(size(col("__g")) > 0)
      .select(col("id"), size(col("__g")).cast("long").as("n_sh"),
        hitCount(col("__g")).as("n_hit"))
      .select(col("id"), col("n_sh"), col("n_hit"),
        (col("n_hit") * 100 >= col("n_sh") * threshPct).as("contaminated"))
  }

  /** Decontamination by EXCISION: instead of flagging whole documents,
    * REMOVE every token that participates in any n-gram shared with
    * the benchmark — the surgical form used when dropping the document
    * would cost too much good text (benchmark strings quoted inside
    * otherwise-clean pages). A token at 1-based position p is cut iff
    * some shared n-gram starts in [p-n+1, p].
    *
    * Scale shape: candidate (id, pos, gramHash) relations join the
    * broadcast benchmark grams map-side (`broadcastBench=false` falls
    * back to a hash join for oversized benchmarks, like [[screen]]);
    * only (id, bad-positions) rows shuffle into the per-doc aggregate.
    * The bad-start arrays then join back by id: when contamination is
    * SPARSE (the norm) that side is small and AQE broadcasts it, so
    * document text never shuffles; under dense contamination the
    * back-join degrades to one sort-merge pass over the text — the
    * honest worst case. The per-token `exists` over the bad array is
    * O(bad) per token, fine while excisions per doc are few; a
    * sorted-array binary search is the lever if they are not.
    *
    * Emits (idCol, clean_text, n_removed) for every candidate with
    * ≥ 1 token. */
  def excise(candidates: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String, n: Int = 3,
             broadcastBench: Boolean = true): DataFrame = {
    // bench grams via the shared gram pipeline; the id-free set form —
    // the benchmark needs only textCol (one distinct, no id exchange)
    val benchRaw = Dedup.hashedShingleSet(benchmark, textCol, n)
    exciseByGrams(candidates,
      if (broadcastBench) broadcast(benchRaw) else benchRaw,
      idCol, textCol, n)
  }

  /** Exact-substring SELF-dedup (the Lee et al. '22 "Deduplicating
    * Training Data" policy in its deterministic form): every n-gram
    * occurring in ≥ `minDf` DISTINCT documents is excised from ALL of
    * them. The repeated-gram set is the corpus's own benchmark — no
    * external reference needed. Unlike [[graft.ext.Boilerplate]]'s
    * fixed windows this is alignment-free: a shared span is found at
    * ANY token offset.
    *
    * Scale shape: the repeated-gram set is by construction the
    * frequent MINORITY of distinct grams (broadcast, with the same
    * opt-out as [[screen]]); the df count moves only (gram, id) 16-byte
    * rows. Downstream is [[exciseByGrams]]'s shape — text shuffles only
    * in the final back-join, broadcast under sparse repetition. */
  def selfExcise(corpus: DataFrame, idCol: String, textCol: String,
                 n: Int = 8, minDf: Long = 2,
                 broadcastGrams: Boolean = true): DataFrame = {
    // hashedShingleRows is distinct per (id, gram), so the count IS
    // document frequency
    val repeated = Dedup.hashedShingleRows(corpus, idCol, textCol, n)
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select(col("s").as("g"))
    exciseByGrams(corpus,
      if (broadcastGrams) broadcast(repeated) else repeated,
      idCol, textCol, n)
  }

  /** Shared excision core: cut every token of `candidates` covered by
    * an n-gram whose xxhash64 appears in `grams` (a single-column `g`
    * relation). Gram construction is Dedup's — the SAME windows/
    * tokens/hashes as hashedShingleRows, so flags and cuts can't
    * drift. A token at 1-based position p is cut iff a listed n-gram
    * starts in [p-n+1, p]. */
  private def exciseByGrams(candidates: DataFrame, grams: DataFrame,
                            idCol: String, textCol: String, n: Int): DataFrame = {
    require(!candidates.columns.exists(Set("__eid", "__bad", "bad_starts")),
      "excise uses internal columns __eid/__bad/bad_starts; rename the input's first")
    val toks = split(col(textCol), " ")
    val idx = Dedup.gramStartIdx(toks, n)
    def gramHash(i: org.apache.spark.sql.Column) =
      xxhash64(Dedup.gramAt(toks, i, n))
    val candGrams = candidates.select(col(idCol).as("__eid"),
      explode(transform(idx, i => struct(i.as("pos"), gramHash(i).as("g")))).as("pg"))
      .select(col("__eid"), col("pg.pos").as("pos"), col("pg.g").as("g"))
    val bad = candGrams.join(grams, Seq("g"), "left_semi")
      .groupBy(col("__eid")).agg(collect_set(col("pos")).as("bad_starts"))
    val kept = filter(
      transform(toks, (t, i0) => struct((i0 + 1).as("p"), t.as("t"))),
      s => !exists(col("__bad"),
        b => b >= s.getField("p") - (n - 1) && b <= s.getField("p")))
    candidates.join(bad, col(idCol) === col("__eid"), "left")
      .withColumn("__bad", coalesce(col("bad_starts"), array().cast("array<int>")))
      .select(col(idCol),
        // '' (not null) for null-text inputs, matching the oracle's
        // coalesce of DuckDB's null empty-list array_to_string
        coalesce(array_join(transform(kept, s => s.getField("t")), " "), lit(""))
          .as("clean_text"),
        (size(toks) - size(kept)).cast("int").as("n_removed"))
  }
}
