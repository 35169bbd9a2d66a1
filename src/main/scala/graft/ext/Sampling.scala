package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation:
  * hash-threshold (Bernoulli) sampling, per-stratum rate control, and
  * hash-ordered k-per-stratum selection. A curation pipeline needs
  * samples that are (a) reproducible across runs and engines — no RNG
  * state, no partition-order dependence — and (b) consistent under
  * re-partitioning, so the same document is kept whether the corpus is
  * read as 10 files or 10 000.
  *
  * The selector is `md5(key)` compared lexicographically against a hex
  * threshold prefix: P(md5 < prefix) = prefix/16^len to within 16^-8.
  * md5 of the same UTF-8 bytes is identical in Spark and DuckDB, and
  * lowercase-hex strings compare bytewise in both, so every operator
  * here is mirrored 1:1 by an ANSI SQL oracle.
  *
  * Scale shape (100 TB): threshold sampling is a map-only filter — no
  * shuffle, no state, arbitrarily parallel. k-per-stratum needs a
  * per-stratum order; a window over raw strata would sort whole strata
  * (terabytes each when the stratum cardinality is low), so the scale
  * form pre-filters with an over-sampling threshold first — survivors
  * per stratum concentrate near E = rate·|stratum| ≫ k rows — and only
  * then ranks. Pick rate ≈ 20·k/|stratum| so the chance of a stratum
  * losing rows below k is negligible; the pre-filter is part of the
  * operator's declared semantics (the oracle applies the same one), so
  * determinism is preserved even in the unlucky tail.
  */
object Sampling {

  /** Deterministic per-row selector in hex: uniform on [0, 16^32). */
  def selector(key: Column): Column = md5(key.cast("string").cast("binary"))

  /** The numeric form of [[selector]]: first 8 md5 hex digits of the
    * concatenated parts as a uint32-ranged long — shared by the
    * hashed-decision operators (MLM masking, FIM cuts). The DuckDB
    * mirror is `CAST('0x' || substr(md5(expr), 1, 8) AS BIGINT)`. */
  def u32(parts: Column*): Column =
    conv(substring(md5(concat(parts: _*).cast("binary")), 1, 8), 16, 10)
      .cast("long")

  /** Hex-prefix threshold for a keep-rate in [0, 1]: 8 hex digits =
    * rate·2^32 rounded, zero-padded ("80000000" ≈ 0.5). Rate 1.0 maps
    * to "g" — lexicographically above every hex digest — so keep-all
    * really keeps ALL rows ("ffffffff" would drop the ~2^-32 of keys
    * whose digest starts with those 8 chars, a real loss at corpus
    * scale). The same string compare holds in the DuckDB mirror. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    if (rate >= 1.0) "g"
    else f"${math.min(math.round(rate * 4294967296.0), 4294967295L)}%08x"
  }

  /** Bernoulli sample at `rate`, keyed on `keyCol` — same rows kept on
    * every run, engine, and partitioning of the input. */
  def sample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(selector(col(keyCol)) < lit(thresholdHex(rate)))

  /** Stratified sample: per-stratum keep-rates with a default for
    * strata not listed. One map-only filter — no shuffle. Delegates to
    * [[applyKeepThresholds]] (one when-chain construction to maintain). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame =
    applyKeepThresholds(df, keyCol, strataCol,
      rates.toSeq.map { case (s, r) => s -> thresholdHex(r) },
      default = thresholdHex(defaultRate))

  /** The `k` rows with the smallest hash per stratum — a deterministic
    * uniform-without-replacement sample of exactly k (or the whole
    * stratum when smaller). `prefilterRate` is the scale guard: rank
    * only hash-threshold survivors (see scaladoc above); strata where
    * the pre-filter leaves fewer than k rows yield the survivors.
    * Emits (all input columns, rank) ordered within stratum. */
  def topKPerStratum(df: DataFrame, keyCol: String, strataCol: String,
                     k: Int, prefilterRate: Double = 1.0): DataFrame = {
    // the contract says ALL input columns pass through + `rank` — a
    // same-named input column would be silently overwritten
    require(!df.columns.contains("rank"),
      "topKPerStratum emits a 'rank' column; rename the input's 'rank' first")
    import org.apache.spark.sql.expressions.Window
    val survivors =
      if (prefilterRate >= 1.0) df
      else df.filter(selector(col(keyCol)) < lit(thresholdHex(prefilterRate)))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(selector(col(keyCol)), col(keyCol))
    survivors
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Data-mixture (token-balanced) sampling: compute per-stratum
    * keep-rates so every stratum contributes the SAME expected token
    * count — the smallest source keeps everything (rate 1.0), larger
    * sources down-sample to match it — then apply the deterministic
    * hash-threshold filter at those rates. This is the mixing step of
    * a training pipeline: re-weighting heterogeneous sources to a
    * target composition without an RNG.
    *
    * The rates are DATA-DEPENDENT, so the threshold is computed as a
    * column mirroring [[thresholdHex]] exactly: `floor(x + 0.5)` (what
    * `math.round` does) instead of `round()` — Spark rounds half-up,
    * DuckDB half-even, and the oracle must land on identical hex.
    * Integer token totals → IEEE-exact double division → identical
    * thresholds in both engines.
    *
    * Scale shape: two aggregates bounded by stratum cardinality, a
    * broadcast of |strata| (stratum, threshold) rows back onto the
    * corpus, and the same map-only filter as [[stratifiedSample]] —
    * the corpus itself is never shuffled. */
  def tokenBalancedSample(df: DataFrame, keyCol: String, strataCol: String,
                          textCol: String): DataFrame = {
    require(!df.columns.contains("__thresh"),
      "tokenBalancedSample uses an internal '__thresh' column; rename the input's first")
    val ntok = size(split(col(textCol), " ")).cast("long")
    val totals = df.groupBy(col(strataCol)).agg(sum(ntok).as("t_s"))
    val m = totals.agg(min(col("t_s")).as("m"))
    val rate = col("m").cast("double") / col("t_s").cast("double")
    val thresholds = totals.crossJoin(m)
      .withColumn("__thresh",
        when(rate >= 1.0, lit("g")).otherwise(
          format_string("%08x",
            least(floor(rate * 4294967296.0 + 0.5).cast("long"),
              lit(4294967295L)))))
      .select(col(strataCol), col("__thresh"))
    df.join(broadcast(thresholds), Seq(strataCol))
      .filter(selector(col(keyCol)) < col("__thresh"))
      .drop("__thresh")
  }

  /** Temperature-weighted source-mixture PLAN — the reweighting math of
    * multilingual/multi-source LLM pipelines: per-source token masses
    * nᵢ draw mixture weights wᵢ ∝ √nᵢ (temperature α = 0.5, the common
    * up-sample-the-tail setting), and each source gets the keep-rate
    * that realizes its share of a token budget of Σn ∕ `budgetDen`.
    * Small sources keep more of themselves (rate ∝ 1∕√nᵢ), the head is
    * down-sampled — apply the rates with [[stratifiedSample]]. NOT to
    * be confused with [[temperatureDownsample]], which counts
    * DOCUMENTS and applies the keep filter itself.
    *
    * α is FIXED at 0.5: `sqrt` is correctly-rounded IEEE-754 on every
    * engine, `pow` is not — a general-α plan could not be cross-engine
    * hash-exact. The √n terms are floored to 6 decimals and summed as
    * DECIMAL (order-free), and every emitted double goes through the
    * repo's floor(x·10ᵏ + 0.5)∕10ᵏ discipline.
    *
    * Scale shape: one aggregate bounded by source cardinality, then a
    * whole-frame window over |sources| rows (driver-scale after the
    * aggregate) — the corpus is scanned once and never shuffled. */
  def temperatureMixture(df: DataFrame, srcCol: String, textCol: String,
                         budgetDen: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ntok = size(filter(split(col(textCol), " "), t => t =!= "")).cast("long")
    val perSrc = df
      .groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(ntok).as("n_tokens"))
    val w = Window.partitionBy() // |sources| rows — post-aggregate scale
    val weight =
      floor(col("sq").cast("double") /
        sum(col("sq")).over(w).cast("double") * 1e4 + 0.5) / 1e4
    perSrc
      .withColumn("sq",
        (floor(sqrt(col("n_tokens").cast("double")) * 1e6 + 0.5) / 1e6)
          .cast("decimal(24,6)"))
      .withColumn("weight", weight)
      .withColumn("rate",
        least(lit(1.0),
          floor((sum(col("n_tokens")).over(w) / budgetDen).cast("long")
              .cast("double") * col("weight") /
            col("n_tokens").cast("double") * 1e4 + 0.5) / 1e4))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight"), col("rate"))
  }

  /** Redact every match of `pattern` (Java regex, RE2-compatible subset
    * so the oracle's regexp_replace agrees) with `replacement` —
    * term-list scrubbing / PII-style redaction as pure column algebra
    * (codegen'd, map-only). */
  def redact(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  /** Token vocabulary with counts: whitespace tokens, empties dropped.
    * Partial (map-side) aggregation then a single shuffle on token —
    * vocabulary cardinality, not corpus size, bounds the reduce side. */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))

  /** PII-class patterns, written in the Java-regex ∩ RE2 common subset
    * (no lookaround, no backreferences) so the DuckDB oracle applies
    * the IDENTICAL strings. `\b` and bounded repetition behave the
    * same in both engines on ASCII input. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"

  /** Scrubs the standard PII classes — email, IPv4, NANP-style phone —
    * with typed placeholders. Pure column algebra (three chained
    * codegen'd regexp_replace), map-only, no shuffle. Replacement
    * ORDER is part of the contract: emails first (their local parts
    * may contain digits), then dotted quads, then phone numbers, so an
    * earlier placeholder can never be re-matched by a later class. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Deterministic global shuffle for training order: every row gets a
    * (shard, pos) address that is pseudorandom in the md5 selector yet
    * identical across runs, engines, and input partitionings — the
    * "shuffle the corpus once, read it back in shard-interleaved
    * order" step of a training pipeline, with no RNG state to persist.
    *
    * shard = first hex digit of the selector (16 shards); pos = rank
    * of the remaining 31 digits within the shard. Scale shape: the
    * only work is one window per shard — each shard sorts |corpus|/16
    * rows of (selector, key) pairs, never the content; at cluster
    * scale widen to 2–3 hex digits (256 / 4 096 shards) so the
    * per-shard sort stays executor-sized. The oracle mirrors the
    * digit→int map with strpos('0123456789abcdef', …) — equal to conv
    * base-16 on one digit. */
  def shuffleOrder(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // emits shard + pos alongside all input columns — a same-named
    // input column would be silently overwritten
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "shuffleOrder emits 'shard' and 'pos'; rename those input columns first")
    val sel = selector(col(keyCol))
    val shard = conv(substring(sel, 1, 1), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(substring(sel, 2, 31), col(keyCol))
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Efraimidis–Spirakis (IPL 2006) weighted sampling WITHOUT
    * replacement: each row draws u ∈ (0, 1] and competes with key
    * u^(1/w); the k largest keys are a weighted sample without
    * replacement — P(row first) = w_i/Σw, exactly. Here u is the
    * repo's deterministic selector (first 8 md5 hex digits, +1 so 0 is
    * excluded), so the "random" draw is reproducible across runs,
    * engines, and partitionings like every other sampler in this file.
    *
    * Key spacing note (why a double key is oracle-safe here): libm pow
    * may differ from DuckDB's by ulps (~1e-16 relative), but with n
    * distinct md5 draws the adjacent-key gaps are ~1/n — flipping an
    * order would need two keys within ulp distance, which 16^8 distinct
    * u values never produce in practice; the emitted key column is
    * still rounded through the display contract.
    *
    * Scale shape: map-only key computation + TakeOrdered top-k (per-
    * partition heaps, driver merge of k·|partitions| rows) — no global
    * sort, no shuffle of the corpus. */
  def weightedTopK(df: DataFrame, keyCol: String, weight: Column,
                   k: Int): DataFrame = {
    require(!df.columns.contains("es_key"),
      "weightedTopK emits 'es_key'; rename the input's first")
    val u32 = conv(substring(selector(col(keyCol)), 1, 8), 16, 10)
      .cast("double")
    val u = (u32 + 1.0) / 4294967296.0
    // E-S requires a finite w > 0: w = 0 would give u^(1/0) = u^Inf = 0
    // (the row silently never sampled), w < 0 a key > 1 (the row
    // dominating every draw), NULL a NULL key (sorts last — silently
    // never sampled), and NaN a NaN key (sorts FIRST under desc —
    // silently occupying every slot). All four corrupt the semantics
    // without a trace, so anything but a finite positive weight fails
    // LOUDLY at evaluation time instead.
    val w = weight.cast("double")
    val key = when(w.isNull || isnan(w) || w <= 0.0,
        raise_error(concat(lit("weightedTopK: weight must be finite and > 0, got "),
          coalesce(w.cast("string"), lit("NULL"))))
          .cast("double"))
      .otherwise(pow(u, lit(1.0) / w))
    df.withColumn("es_key", key)
      .orderBy(col("es_key").desc, col(keyCol))
      .limit(k)
  }

  /** Epoch-aware mixture MATERIALIZATION — the fractional-epoch
    * upsampling of published LM data recipes (GPT-3's per-dataset
    * "epochs elapsed when training", The Pile's per-set epoch counts):
    * a source weighted e = 2.4 contributes every document twice, plus
    * a third copy for a deterministic 40% of its documents. Emits one
    * row per (document, repetition) with `rep` in [0, reps): floor(e)
    * full copies always, plus one extra iff
    * selector(doc_id ‖ ":epoch") < thresholdHex(frac(e)) — the same
    * md5 machinery as every sampler here, on a suffixed key so the
    * draw is independent of the plain samplers' draws on the same ids.
    *
    * Scale shape: MAP-ONLY fan-out — per-source (floor, threshold)
    * pairs are plan-time literals, the extra-copy decision is one md5
    * per row, and the repetition explode is in-row; no shuffle, no
    * state, and re-tuning one source's epochs never perturbs another
    * source's draws (or the kept set of reps below the new floor).
    * Sources weighted 0 vanish (their rep sequence is empty). */
  def epochMix(df: DataFrame, idCol: String, sourceCol: String,
               epochs: Map[String, Double],
               defaultEpochs: Double = 1.0): DataFrame = {
    val all = epochs.values ++ Iterator(defaultEpochs)
    require(all.forall(e => e >= 0.0 && e <= 1024.0 && !e.isNaN),
      s"epochs out of [0, 1024]: $epochs / $defaultEpochs")
    def perSource(f: Double => Column): Column =
      epochs.foldRight(f(defaultEpochs)) { case ((src, e), acc) =>
        when(col(sourceCol) === src, f(e)).otherwise(acc)
      }
    val nFull = perSource(e => lit(math.floor(e).toInt))
    val thr = perSource(e => lit(thresholdHex(e - math.floor(e))))
    val extra = (selector(concat(col(idCol).cast("string"), lit(":epoch")))
      < thr).cast("int")
    val reps = nFull + extra
    df.withColumn("rep",
        explode(when(reps > 0, sequence(lit(0L), reps.cast("long") - 1L))
          .otherwise(array().cast("array<long>"))))
  }

  /** Temperature-flattened source DOWNSAMPLING at α = 1/2 — the
    * standard multilingual/multi-source rebalancing knob (mBERT/
    * XLM-R's exponentiated sampling, p_s ∝ n_s^α) applied as a keep
    * FILTER by document count: keep-rates r_s = sqrt(n_min / n_s), so
    * the smallest source keeps everything and a source 100× larger
    * keeps 10% — flattening the size skew without upsampling (that is
    * [[epochMix]]'s job; compose them for a full recipe). NOT to be
    * confused with [[temperatureMixture]], which emits a per-source
    * (weight, rate) PLAN by token mass and leaves the filtering to the
    * caller — this one counts documents and applies the cut. Keep
    * decision is the usual deterministic [[selector]] <
    * [[thresholdHex]] compare.
    *
    * α is FIXED at 1/2 because it makes the rates cross-engine
    * BIT-EXACT with no rounding contract at all: n_min/n_s and sqrt
    * are both IEEE correctly-rounded single operations, so Scala and
    * DuckDB compute the identical double, and thresholdHex's
    * floor(r·2^32 + 0.5) grid lands identically (a general-α pow()
    * is not correctly-rounded and could flip a knife-edge document).
    *
    * Scale shape: one |sources|-bounded count aggregation to the
    * driver (model metadata), then a MAP-ONLY filter with the
    * per-source thresholds as plan literals — no join, no shuffle on
    * the data path, the [[stratifiedSample]] economics with
    * data-derived rates. */
  def temperatureDownsample(df: DataFrame, keyCol: String,
                            sourceCol: String): DataFrame =
    applyKeepThresholds(df, keyCol, sourceCol,
      temperatureThresholds(df, sourceCol))

  /** The frozen per-source keep thresholds of [[temperatureDownsample]]
    * — |sources|-bounded model metadata (source → [[thresholdHex]]
    * string), computed once so a STREAM can be filtered against them
    * forever (the train-once / apply-forever split every frozen-model
    * operator here uses). NULL sources fail loudly: a null group would
    * enter n_min yet its rows can never match the when-chain filter —
    * every OTHER source's rate would silently shrink while the null
    * rows all drop. Clean the source column first. */
  def temperatureThresholds(df: DataFrame,
                            sourceCol: String): Seq[(String, String)] = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getLong(1))).toSeq
    require(counts.nonEmpty, "temperatureDownsample: no sources (empty input)")
    require(!counts.exists(_._1 == null),
      "temperatureDownsample: NULL source values present — they would " +
        "skew every other source's keep-rate and then be dropped " +
        "entirely; coalesce or filter the source column first")
    val nMin = counts.map(_._2).min
    counts.map { case (s, n) =>
      s -> thresholdHex(math.sqrt(nMin.toDouble / n))
    }
  }

  /** Map-only keep filter under frozen per-stratum thresholds — works
    * unchanged on batch frames and streams (no shuffle, no state).
    * Strata absent from the table keep `default` ("00000000" = below
    * every digest = keep nothing, the conservative reading of "not in
    * the recipe"). Shared by [[stratifiedSample]] and the temperature
    * family — the single when-chain construction. */
  def applyKeepThresholds(df: DataFrame, keyCol: String, sourceCol: String,
                          thresholds: Seq[(String, String)],
                          default: String = "00000000"): DataFrame = {
    val thr = thresholds.foldRight(lit(default): Column) {
      case ((s, t), acc) => when(col(sourceCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(selector(col(keyCol)) < thr)
  }

  /** One row of the re-freeze audit: a source's frozen vs current
    * keep-rate (hex thresholds plus the decoded |rate drift|). A
    * source NEW since the freeze has `frozenHex = null` (under the
    * frozen recipe it kept NOTHING — the [[applyKeepThresholds]]
    * default — so its drift is its whole current rate); a source that
    * VANISHED has `currentHex = null` and drift 0 (its stale threshold
    * matches no rows). */
  final case class ThresholdDrift(source: String, frozenHex: String,
                                  currentHex: String, drift: Double)

  private def rateOf(hex: String): Double =
    if (hex == null) 0.0
    else if (hex == "g") 1.0 // thresholdHex's keep-ALL sentinel
    else java.lang.Long.parseLong(hex, 16) / 4294967296.0

  /** Drift audit for a frozen [[temperatureThresholds]] table against
    * the CURRENT source distribution of `df`: one row per source seen
    * in either table, both thresholds side by side. Costs one
    * |sources|-bounded aggregation — run it on a sampled window, not
    * every micro-batch. */
  def temperatureDrift(df: DataFrame, sourceCol: String,
                       frozen: Seq[(String, String)]): Seq[ThresholdDrift] = {
    val current = temperatureThresholds(df, sourceCol).toMap
    val old = frozen.toMap
    (old.keySet ++ current.keySet).toSeq.sorted.map { s =>
      val f = old.get(s).orNull
      val c = current.get(s).orNull
      ThresholdDrift(s, f, c,
        if (c == null) 0.0 else math.abs(rateOf(c) - rateOf(f)))
    }
  }

  /** RE-FREEZE POLICY for the frozen temperature recipe (the gap the
    * frozen-forever contract leaves open: a drifting source
    * distribution silently keeps stale rates). Compares the frozen
    * thresholds against the current distribution and re-freezes iff
    * some source's keep-rate drifted more than `maxDrift` (absolute
    * rate difference in [0,1]) — returning the thresholds to USE, the
    * re-freeze flag, and the full audit (both tables, per source). A
    * re-freeze is A NEW RECIPE VERSION: documents already emitted
    * under the old thresholds are not revisited, so the caller must
    * record the audit (and typically the batch/offset boundary) next
    * to the new recipe — which is why both tables come back rather
    * than the decision alone. */
  def refreshTemperatureThresholds(df: DataFrame, sourceCol: String,
                                   frozen: Seq[(String, String)],
                                   maxDrift: Double)
      : (Seq[(String, String)], Boolean, Seq[ThresholdDrift]) = {
    require(maxDrift >= 0.0 && maxDrift <= 1.0 && !maxDrift.isNaN,
      s"maxDrift must be a rate in [0,1]: $maxDrift")
    val audit = temperatureDrift(df, sourceCol, frozen)
    val refresh = audit.exists(_.drift > maxDrift)
    val use =
      if (refresh) audit.filter(_.currentHex != null)
        .map(d => d.source -> d.currentHex)
      else frozen
    (use, refresh, audit)
  }
}
