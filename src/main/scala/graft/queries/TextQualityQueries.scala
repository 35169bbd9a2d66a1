package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextStats}
import graft.queries.ExtHelpers._

/** Text-analysis family: language ID, quality scores, token/LM
  * statistics, hygiene normalizations, PII scrubbing.
  *
  * Split out of ExtQueries (round 12) with zero behavior change; keys
  * and oracle text are unchanged. Shared planted fixtures and oracle
  * generators live in [[ExtHelpers]].
  */
object TextQualityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- text analysis ----------------------------------------------
    "q_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextStats.langIdCol(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),
    "q_quality_score" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextStats.qualityCol(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Code-switching / language-mixture detection: language-ID each
    // HALF of the document and flag disagreement — the multilingual-
    // corpus hygiene check (mixed documents poison both per-language
    // LMs and language-stratified sampling). Every 4th doc gets a
    // planted foreign tail (stopword blocks shared verbatim with the
    // oracle), so both the mixed and unmixed branches are exercised;
    // the oracle recomputes the same halves, so the verdict is pinned
    // regardless of where the split lands. Map-only.
    "q_lang_mix" -> ((s, d) => {
      val blockFor = LangMixBlocks
      val block = when(col("doc_id") % 3 === 0, blockFor(0)._2)
        .when(col("doc_id") % 3 === 1, blockFor(1)._2)
        .otherwise(blockFor(2)._2)
      val combined = when(col("doc_id") % 4 === 0,
        concat(coalesce(col("text"), lit("")), lit(" "), block))
        .otherwise(coalesce(col("text"), lit("")))
      val docs = Tables.documents(s, d)
        .withColumn("combined", combined)
        .withColumn("half", expr("(size(split(combined, ' ')) + 1) div 2"))
        .withColumn("head_txt",
          concat_ws(" ", slice(split(col("combined"), " "), lit(1), col("half"))))
        .withColumn("tail_txt",
          concat_ws(" ", slice(split(col("combined"), " "),
            col("half") + 1, size(split(col("combined"), " ")) - col("half"))))
      docs.select(col("doc_id"),
          TextStats.langIdCol(col("head_txt")).as("lang_head"),
          TextStats.langIdCol(col("tail_txt")).as("lang_tail"))
        .withColumn("is_mixed",
          col("lang_head") =!= col("lang_tail") &&
            col("lang_head") =!= "unknown" && col("lang_tail") =!= "unknown")
        .orderBy(col("doc_id"))
    }),
    "q_token_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextStats.wsTokensCol(col("text")).as("ws_tokens"),
          TextStats.subwordPiecesCol(col("text")).as("subword_pieces"))
        .orderBy(col("doc_id"))
    }),
    "q_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextStats.fingerprintCol(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // ---- sketch aggregate: per-source minhash-union similarity ------
    // The sketch estimates carry ±1/sqrt(64) error, so raw estimates
    // have no SQL mirror — but the SKETCH ALGEBRA does: the signature
    // is a pure function of the group's text set, so (a) a cloned
    // source must estimate J = 1.0 against its original exactly, and
    // (b) the clone's estimate against every third source must equal
    // the original's bit-for-bit. Both are hard invariants of a
    // correct merge-able sketch (the property that makes it safe to
    // combine partial aggregates across 1000 executors).
    "q_source_similarity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cloned = docs.filter(col("source") === "src0")
        .withColumn("source", lit("zsrc_clone"))
      val sims = graft.ext.MinHashAgg.groupSimilarity(
        docs.unionByName(cloned), "source", "text")
      val cloneOk = sims
        .filter(col("g1") === "src0" && col("g2") === "zsrc_clone")
        .select(lit("clone_exact").as("g"), (col("est_jaccard") === 1.0).as("ok"))
      val vsClone = sims.filter(col("g2") === "zsrc_clone" && col("g1") =!= "src0")
        .select(col("g1").as("g"), col("est_jaccard").as("e1"))
      val vsSrc0 = sims.filter(col("g1") === "src0" && col("g2") =!= "zsrc_clone")
        .select(col("g2").as("g"), col("est_jaccard").as("e2"))
        .unionByName(sims.filter(col("g2") === "src0")
          .select(col("g1").as("g"), col("est_jaccard").as("e2")))
      val invOk = vsClone.join(vsSrc0, "g")
        .select(col("g"), (col("e1") === col("e2")).as("ok"))
      cloneOk.unionByName(invOk).orderBy(col("g"))
    }),
    // unigram log-probability scoring (the CCNet-style LM-quality
    // proxy): train the unigram model on the corpus itself (one
    // token-bounded agg), score each doc by its mean token log-prob —
    // fluent/common text scores high, gibberish and rare-token noise
    // low. Two bounded shuffles: tok join (corpus tokens), doc re-agg.
    "q_unigram_logprob" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = freq.agg(sum(col("cnt")).as("n"))
      // per-token logp is rounded to 6 decimals THEN summed as exact
      // decimal: a raw double sum would depend on partition merge
      // order (the repo's oracle-stability rule — see the
      // RelationalQueries scaladoc); each rounded per-token value is
      // deterministic, the decimal sum is order-free, and only the
      // terminal mean converts back to double
      val logp6 = round(log(col("cnt").cast("double") / col("n").cast("double")), 6)
        .cast("decimal(14,6)")
      // terminal mean via floor(x·10^4 + 0.5), not round(): round() of
      // a double ties engine-specifically at .xxxx5 (the same hazard
      // hit at sf0.1 in q_bigram_logprob); floor, IEEE multiply, and
      // divide are bit-exact everywhere
      toks.join(freq, Seq("tok")).crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(logp6).as("slog"))
        .select(col("doc_id"), col("n_tok"),
          (floor(col("slog").cast("double") / col("n_tok") * 1e4 + 0.5) / 1e4)
            .as("mean_logp"))
        .orderBy(col("doc_id"))
    }),

    // out-of-vocabulary rate per document (tokenizer-prep signal: how
    // much of each doc a fixed vocabulary covers). The top-100
    // vocabulary is derived IN-PLAN (count desc, token asc — a
    // deterministic cut) and broadcast to a token-level left join;
    // the only shuffles are the vocab agg (bounded by vocabulary
    // cardinality) and the per-doc count re-agg. The rate is a single
    // long/long IEEE division — bit-exact cross-engine, no rounding.
    "q_oov_rate" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val vocab = graft.ext.Sampling.vocab(Tables.documents(s, d), "text")
        .orderBy(col("cnt").desc, col("tok")).limit(100)
        .select(col("tok"), lit(true).as("invocab"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          (count(lit(1)) - count(col("invocab"))).as("n_oov"))
        .select(col("doc_id"), col("n_tok"), col("n_oov"),
          (col("n_oov").cast("double") / col("n_tok")).as("oov_rate"))
        .orderBy(col("doc_id"))
    }),
    // bigram conditional LM (the n-gram step up from the unigram
    // proxy): p(w2|w1) = C(w1 w2) / C(w1 ·), both counts trained on
    // the corpus itself in one pass — every document bigram is in the
    // model, so MLE needs no smoothing. Same determinism discipline as
    // the unigram score: per-bigram logp rounded to 6 decimals, summed
    // as exact decimal (order-free), terminal mean as double. Shuffles
    // are bounded by distinct-bigram cardinality, never corpus size;
    // docs with < 2 tokens have no bigrams and no row (both sides).
    "q_bigram_logprob" -> ((s, d) => {
      // toks MUST be a materialized column before the transform lambda
      // slices into it: HOFs are interpreted, so slicing an inline
      // split() re-tokenizes the document per bigram — O(words²)/row
      // (the LinearGate.scoreFrame trap)
      val toks = col("__toks")
      val bidx = when(size(toks) >= 2, sequence(lit(1), size(toks) - 1))
        .otherwise(array().cast("array<int>"))
      val bigr = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__toks"))
        .select(col("doc_id"),
          explode(transform(bidx, i => concat_ws(" ", slice(toks, i, lit(2)))))
            .as("bg"))
      val bgFreq = bigr.groupBy(col("bg")).agg(count(lit(1)).as("cnt2"))
      val ctxFreq = bgFreq
        .groupBy(split(col("bg"), " ")(0).as("w1"))
        .agg(sum(col("cnt2")).as("cnt1"))
      val model = bgFreq
        .withColumn("w1", split(col("bg"), " ")(0))
        .join(ctxFreq, Seq("w1"))
      val logp6 =
        round(log(col("cnt2").cast("double") / col("cnt1").cast("double")), 6)
          .cast("decimal(14,6)")
      // terminal mean via floor(x·10^4 + 0.5): round() of a double is
      // engine-specific exactly at .xxxx5 ties (hit at sf0.1); floor,
      // IEEE multiply, and divide are bit-exact everywhere
      bigr.join(model, Seq("bg"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bg"), sum(logp6).as("slog"))
        .select(col("doc_id"), col("n_bg"),
          (floor(col("slog").cast("double") / col("n_bg") * 1e4 + 0.5) / 1e4)
            .as("mean_logp"))
        .orderBy(col("doc_id"))
    }),

    // relative quality gate: keep each source's top quality quartile —
    // percentile-based curation thresholds adapt per source instead of
    // hard-coding one global cutoff. One shuffle on source; ntile /
    // percent_rank evaluate in the same per-partition sort pass.
    "q_quality_topquartile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextStats.qualityCol(col("text")).as("quality"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("q4", ntile(4).over(w))
        .filter(col("q4") === 1)
        .orderBy(col("doc_id"))
    }),

    // heavy hitters via the freqItems sketch (Karp/Misra-Gries family):
    // one pass, ≤1/support counters per partition, merged — only the
    // ≤40-item summary reaches the driver. Its error is one-sided
    // (a SUPERSET of every token with share > support), so the gate
    // emits the exact-heavy tokens (share > 2.5%, comfortably under
    // the corpus max ~3.5%) with a found-in-sketch boolean the
    // guarantee forces true — extras the sketch may carry are not
    // emitted, so run-order variance can't leak into the result.
    "q_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val sketch = toks.stat.freqItems(Seq("tok"), 0.025)
        .head().getSeq[String](0).toSet
      val foundUdf = udf((t: String) => sketch.contains(t))
      val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      counts.crossJoin(broadcast(total))
        .filter(col("cnt") > col("total") / lit(40.0))
        .select(col("tok"), col("cnt"), foundUdf(col("tok")).as("found"))
        .orderBy(col("tok"))
    }),

    // term-list scrubbing (PII-style redaction shape): map-only,
    // codegen'd regexp over the corpus
    "q_redact_terms" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ext.Sampling.redact(col("text"), RedactPattern, "<TERM>")
            .as("red_text"))
        .orderBy(col("doc_id"))
    }),
    // rule-ensemble quality vote (the DCLM/Gopher pattern of combining
    // independent signals): absolute quality, within-doc repetition,
    // and a word-count band each vote; keep = majority. Integer and
    // boolean outputs only — no float threshold can drift
    "q_quality_ensemble" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d).select(
          col("doc_id"),
          (TextStats.qualityCol(col("text")) >= 0.5).as("q_ok"),
          (size(array_distinct(toks)) * 2 >= size(toks)).as("rep_ok"),
          (size(toks) >= 20 && size(toks) <= 1000).as("len_ok"))
        .withColumn("votes", col("q_ok").cast("int") +
          col("rep_ok").cast("int") + col("len_ok").cast("int"))
        .withColumn("keep", col("votes") >= 2)
        .orderBy(col("doc_id"))
    }),
    // PII-class scrubbing (email / IPv4 / phone with typed
    // placeholders): the corpus text carries no PII, so the query
    // plants deterministic instances per row — the operator itself is
    // three chained codegen'd regexp_replace, map-only
    "q_pii_scrub" -> ((s, d) => {
      val ptext = concat(coalesce(col("text"), lit("")),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com at 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7 or 555-01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ext.Sampling.scrubPii(ptext).as("scrubbed"))
        .orderBy(col("doc_id"))
    }),
    // Checksum-VALIDATED card redaction (the codegen'd LuhnRedact
    // expression): plants a genuinely Luhn-valid card number on even
    // docs and a checksum-broken near-miss (last digit bumped) on odd
    // ones — only the valid runs may become [CARD], the near-misses
    // must survive untouched, which a bare regexp scrub cannot
    // reproduce. Oracle predicts the redacted text analytically from
    // the same planted lists. Map-only.
    "q_luhn_scrub" -> ((s, d) => {
      val valid = Array("4111111111111111", "5555555555554444",
        "4012888888881881", "6011000990139424")
      val invalid = valid.map(v => v.init + ((v.last - '0' + 1) % 10).toString)
      val pick = (arr: Array[String]) =>
        (col("doc_id") % 4).cast("int") match { case c =>
          when(c === 0, arr(0)).when(c === 1, arr(1))
            .when(c === 2, arr(2)).otherwise(arr(3)) }
      // digits in the BASE text are masked first: a corpus regeneration
      // that happened to plant a Luhn-valid run inside `text` would
      // otherwise redact on the Spark side while the analytic oracle
      // (which only models the planted number) left it raw
      val planted = concat(
        regexp_replace(coalesce(col("text"), lit("")), "[0-9]", "x"),
        lit(" pay "),
        when(col("doc_id") % 2 === 0, pick(valid)).otherwise(pick(invalid)),
        lit(" ref "), col("doc_id").cast("string"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.LuhnRedact.luhn_redact(planted).as("scrubbed"))
        .select(col("doc_id"), md5(col("scrubbed")).as("scrub_md5"),
          col("scrubbed").contains("[CARD]").as("redacted"))
        .orderBy(col("doc_id"))
    }),
    // stupid-backoff trigram scoring (Brants et al. 2007 — the
    // smoothing designed FOR distributed n-gram LMs: no normalization
    // pass, so every model relation is one bounded aggregation). The
    // model trains on the EVEN-id half and scores ALL docs, so the
    // odd half genuinely exercises all three legs: seen trigram →
    // C(w1w2w3)/C(w1w2); else seen bigram → 0.4·C(w2w3)/C(w2); else
    // 0.4²·(C(w3)+1)/(N+V) — the unigram leg is Laplace-floored (a
    // documented deviation: the paper assumes vocab coverage, but a
    // scoring-side token absent from training would hit log 0).
    // Prefix property guarantees each leg's denominator is non-null
    // when its numerator is. Shuffles bounded by distinct-gram
    // cardinality; same round-6 → decimal-sum → floor-mean discipline
    // as the bigram scorer. Per-doc n_exact/n_bo1/n_bo2 expose the
    // backoff mix as integers.
    "q_trigram_backoff" -> ((s, d) => {
      val toks = col("__toks")
      def grams(df: DataFrame, k: Int, alias: String) = {
        val idx = when(size(toks) >= k, sequence(lit(1), size(toks) - (k - 1)))
          .otherwise(array().cast("array<int>"))
        df.select(col("doc_id"),
          explode(transform(idx, i => concat_ws(" ", slice(toks, i, lit(k)))))
            .as(alias))
      }
      val docsAll = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      val train = docsAll.filter(col("doc_id") % 2 === 0)
      val tri = grams(train, 3, "tg").groupBy(col("tg")).agg(count(lit(1)).as("c3"))
      val bi = grams(train, 2, "g").groupBy(col("g")).agg(count(lit(1)).as("cb"))
      val uni = grams(train, 1, "g").groupBy(col("g")).agg(count(lit(1)).as("cu"))
      val totals = uni.agg(sum(col("cu")).as("n"), count(lit(1)).as("v"))
      val w = split(col("tg"), " ")
      val rows = grams(docsAll, 3, "tg")
        .select(col("doc_id"), col("tg"),
          concat_ws(" ", w(0), w(1)).as("ctx12"),
          concat_ws(" ", w(1), w(2)).as("bg23"),
          w(1).as("w2"), w(2).as("w3"))
      val joined = rows
        .join(tri, Seq("tg"), "left")
        .join(bi.select(col("g").as("ctx12"), col("cb").as("c12")), Seq("ctx12"), "left")
        .join(bi.select(col("g").as("bg23"), col("cb").as("c23")), Seq("bg23"), "left")
        .join(uni.select(col("g").as("w2"), col("cu").as("cu2")), Seq("w2"), "left")
        .join(uni.select(col("g").as("w3"), col("cu").as("cu3")), Seq("w3"), "left")
        .crossJoin(broadcast(totals))
      val p = when(col("c3").isNotNull,
          col("c3").cast("double") / col("c12").cast("double"))
        .when(col("c23").isNotNull,
          lit(0.4) * col("c23").cast("double") / col("cu2").cast("double"))
        .otherwise(lit(0.4) * lit(0.4)
          * (coalesce(col("cu3"), lit(0L)).cast("double") + lit(1.0))
          / (col("n").cast("double") + col("v").cast("double")))
      val logp6 = round(log(p), 6).cast("decimal(14,6)")
      joined
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tg"),
          sum(when(col("c3").isNotNull, 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("c3").isNull && col("c23").isNotNull, 1L).otherwise(0L))
            .as("n_bo1"),
          sum(when(col("c3").isNull && col("c23").isNull, 1L).otherwise(0L))
            .as("n_bo2"),
          sum(logp6).as("slog"))
        .select(col("doc_id"), col("n_tg"), col("n_exact"), col("n_bo1"),
          col("n_bo2"),
          (floor(col("slog").cast("double") / col("n_tg") * 1e4 + 0.5) / 1e4)
            .as("mean_logp"))
        .orderBy(col("doc_id"))
    }),

    // vocabulary building (BPE-precursor token counts): partial agg +
    // one shuffle bounded by vocabulary cardinality, deterministic
    // truncation (count desc, token asc)
    "q_vocab_topn" -> ((s, d) => {
      graft.ext.Sampling.vocab(Tables.documents(s, d), "text")
        .orderBy(col("cnt").desc, col("tok"))
        .limit(20)
    }),
    // heavy hitters via count-min sketch (ext.CountMin): the
    // fixed-memory alternative to the vocab aggregation when the token
    // space won't fit a shuffle — Depth·Width counters total. The
    // exact-count side here exists only as the query's verification
    // contract (overestimate_ok: the CMS ≥-true guarantee per token);
    // a production probe joins candidates against the broadcast sketch
    // alone. Deterministic md5 row hashes → the oracle REPLAYS the
    // sketch, it doesn't trust a plant.
    "q_cms_heavy_hitters" -> ((s, d) => {
      val toks = graft.ext.CountMin.tokens(Tables.documents(s, d), "text")
      val sk = graft.ext.CountMin.sketch(toks)
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      graft.ext.CountMin.estimates(exact, sk)
        .withColumn("overestimate_ok", col("est") >= col("n"))
        .orderBy(col("est").desc, col("tok"))
        .limit(20)
    }),
    // within-doc repetition signals (the Gopher-style quality rule):
    // token and trigram duplication counts, pure column algebra —
    // map-only, integer outputs so the gate can't hinge on rounding
    "q_repetition" -> ((s, d) => {
      // same staging as q_bigram_logprob: the trigram transform slices
      // into the token array per element, so the array must be a
      // materialized column, not an inline split — and the trigram
      // array itself materializes before its two consumers
      val toks = col("__toks")
      val idx = when(size(toks) >= 3, sequence(lit(1), size(toks) - 2))
        .otherwise(array().cast("array<int>"))
      val tris = transform(idx, i => concat_ws(" ", slice(toks, i, lit(3))))
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__toks"))
        .select(col("doc_id"), col("__toks"), tris.as("__tris"))
        .select(
          col("doc_id"),
          size(toks).as("n_tok"),
          size(array_distinct(toks)).as("n_tok_uniq"),
          size(col("__tris")).as("n_tri"),
          size(array_distinct(col("__tris"))).as("n_tri_uniq"))
        .withColumn("repetitive", col("n_tok_uniq") * 2 < col("n_tok"))
        .orderBy(col("doc_id"))
    }),
    // data-quality constraint report (the pre-ship validation step):
    // one map-side-combined aggregate emitting the checked invariants
    "q_data_quality" -> ((s, d) => {
      Tables.documents(s, d).agg(
          count(lit(1)).as("n_rows"),
          count(col("text")).as("n_text_nonnull"),
          countDistinct(col("doc_id")).as("n_ids"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .select(col("n_rows"), col("n_text_nonnull"), col("n_ids"),
          col("min_chars"), col("max_chars"),
          (col("n_ids") === col("n_rows")).as("id_unique"),
          (col("n_text_nonnull") === col("n_rows")).as("text_complete"),
          (col("min_chars") >= 1 && col("max_chars") <= 100000).as("chars_in_range"))
    }),

    // Accent folding (NFD + strip combining marks): the search-side
    // normalization that merges "résumé"/"resume". The planted suffix
    // mixes PRECOMPOSED accented chars with a DECOMPOSED one — both
    // spellings must fold to the same bare ASCII, which the oracle
    // states analytically.
    "q_ascii_fold" -> ((s, d) => {
      val planted = concat(substring(col("text"), 1, 56),
        lit(" \u00E9\u00C5\u00F1\u00FC\u00E7 e\u0301 fin"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.UnicodeNormalize.asciiFold(planted).as("folded_text"))
        .orderBy(col("doc_id"))
    }),

    // Mojibake repair (ftfy's core fix): double-encoded UTF-8 — text
    // whose bytes were misread as Latin-1 and re-encoded, é → Ã© —
    // re-decoded IFF the Latin-1 bytes are themselves valid UTF-8 (the
    // double-encoding signature); genuine Latin-1 and clean rows pass
    // through untouched. Every third doc gets a planted mojibake
    // suffix; the oracle states the REPAIRED text analytically, so
    // only a correct re-decode (and a correct no-op on clean rows)
    // matches. Map-only codegen'd expression, ASCII fast path.
    "q_fix_mojibake" -> ((s, d) => {
      val planted = concat(substring(col("text"), 1, 48),
        when(col("doc_id") % 3 === 0,
          lit(" caf\u00C3\u00A9 n\u00C2\u00B07")).otherwise(lit(" ok")))
      val fixed = graft.functions.FixMojibake.fix_mojibake(planted)
      Tables.documents(s, d)
        .select(col("doc_id"), fixed.as("fixed_text"),
          (fixed =!= planted).as("was_broken"))
        .orderBy(col("doc_id"))
    }),

    // Unicode NFC canonicalization (UAX #15) — the ingestion-time
    // cleanup that makes byte-level dedup see precomposed (é) and
    // decomposed (e+U+0301) spellings as ONE document. The planted
    // suffix mixes three decomposed sequences with a precomposed é;
    // the codegen'd UnicodeNormalize expression must compose exactly
    // the three (n_composed counts them via the char-length delta).
    // Map-only; the ASCII fast path never copies (isNormalized probe).
    "q_normalize_text" -> ((s, d) => {
      val planted = concat(substring(col("text"), 1, 64),
        lit(" e\u0301 A\u030A \u00E9 n\u0303"))
      val norm = graft.functions.UnicodeNormalize.nfc(planted)
      Tables.documents(s, d)
        .select(col("doc_id"), norm.as("norm_text"),
          (length(planted) - length(norm)).cast("int").as("n_composed"))
        .orderBy(col("doc_id"))
    }),
  )

  /** The count-min replay over any `SELECT text …` corpus relation —
    * shared by the batch query and the streaming-ingest query (whose
    * merged store must equal the sketch of the unioned corpus: the
    * mergeability identity). */
  /** The count-min replay CTE chain (through `est`) — shared by the
    * heavy-hitter oracles and the compaction-gate oracle. */
  def cmsEstCtesSql(docsFrom: String): String =
    s"""WITH docs AS ($docsFrom),
       |toks AS (
       |  SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok
       |                   FROM docs) t WHERE tok <> ''),
       |rb AS (
       |  SELECT r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8)
       |            AS BIGINT) % ${graft.ext.CountMin.Width} AS b
       |  FROM toks CROSS JOIN (SELECT unnest(range(${graft.ext.CountMin.Depth})) AS r)),
       |sk AS (SELECT r, b, count(*) AS cnt FROM rb GROUP BY 1, 2),
       |ex AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
       |est AS (
       |  SELECT e.tok, e.n, min(coalesce(s.cnt, 0)) AS est
       |  FROM ex e
       |  CROSS JOIN (SELECT unnest(range(${graft.ext.CountMin.Depth})) AS r2)
       |  LEFT JOIN sk s ON s.r = r2
       |   AND s.b = CAST('0x' || substr(md5(CAST(r2 AS VARCHAR) || ':' || e.tok), 1, 8)
       |             AS BIGINT) % ${graft.ext.CountMin.Width}
       |  GROUP BY 1, 2)""".stripMargin

  def cmsOracleSql(docsFrom: String): String =
    cmsEstCtesSql(docsFrom) + """
      |SELECT tok, n, est, est >= n AS overestimate_ok
      |FROM est ORDER BY est DESC, tok LIMIT 20""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_lang_id" ->
      s"""SELECT doc_id, ${TextStats.langIdSql("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      s"""SELECT doc_id, ${TextStats.qualitySql("text")} AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_mix" -> {
      val blockCase = s"""CASE WHEN doc_id % 3 = 0 THEN '${LangMixBlocks(0)._2}'
                         |       WHEN doc_id % 3 = 1 THEN '${LangMixBlocks(1)._2}'
                         |       ELSE '${LangMixBlocks(2)._2}' END""".stripMargin
      s"""WITH c AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 4 = 0
         |         THEN coalesce(text, '') || ' ' || ($blockCase)
         |         ELSE coalesce(text, '') END AS combined
         |  FROM documents),
         |h AS (SELECT doc_id, string_split(combined, ' ') AS t,
         |        (len(string_split(combined, ' ')) + 1) // 2 AS half
         |      FROM c),
         |seg AS (SELECT doc_id,
         |          coalesce(array_to_string(t[1 : half], ' '), '') AS head_txt,
         |          coalesce(array_to_string(t[half + 1 : len(t)], ' '), '')
         |            AS tail_txt
         |        FROM h)
         |SELECT doc_id,
         |  ${TextStats.langIdSql("head_txt")} AS lang_head,
         |  ${TextStats.langIdSql("tail_txt")} AS lang_tail,
         |  (${TextStats.langIdSql("head_txt")} <> ${TextStats.langIdSql("tail_txt")}
         |   AND ${TextStats.langIdSql("head_txt")} <> 'unknown'
         |   AND ${TextStats.langIdSql("tail_txt")} <> 'unknown') AS is_mixed
         |FROM seg ORDER BY doc_id""".stripMargin
    },
    "q_token_stats" ->
      s"""SELECT doc_id,
         |  cast(len(string_split(text, ' ')) AS INT) AS ws_tokens,
         |  cast(len(regexp_extract_all(text, '${TextStats.SubwordRegexSql}')) AS INT) AS subword_pieces
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      "SELECT doc_id, sha256(text) AS fp FROM documents ORDER BY doc_id",
    "q_source_similarity" ->
      """SELECT g, true AS ok FROM (
        |  SELECT 'clone_exact' AS g
        |  UNION ALL
        |  SELECT DISTINCT source FROM documents WHERE source <> 'src0')
        |ORDER BY g""".stripMargin,
    // same unigram model in SQL; per-token round → exact decimal sum
    // (order-free) → terminal double, mirroring the Spark side
    "q_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |tt AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        |freq AS (SELECT tok, count(*) AS cnt FROM tt GROUP BY 1),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM freq)
        |SELECT doc_id, count(*) AS n_tok,
        |  floor(CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE)), 6)
        |                      AS DECIMAL(14,6))) AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4
        |    AS mean_logp
        |FROM tt JOIN freq USING (tok) CROSS JOIN n
        |GROUP BY doc_id, n.n ORDER BY doc_id""".stripMargin,
    "q_oov_rate" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tt AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
        |v AS (SELECT tok, true AS invocab FROM (
        |        SELECT tok, count(*) AS c FROM tt GROUP BY 1
        |        ORDER BY c DESC, tok LIMIT 100)),
        |j AS (SELECT tt.doc_id, tt.tok, v.invocab
        |      FROM tt LEFT JOIN v USING (tok))
        |SELECT doc_id, count(*) AS n_tok,
        |  count(*) - count(invocab) AS n_oov,
        |  CAST(count(*) - count(invocab) AS DOUBLE) / count(*) AS oov_rate
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same bigram model in SQL; cnt1 = sum of bigram counts sharing the
    // context word (DuckDB sum(BIGINT) is HUGEINT — cast back)
    "q_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |b AS (SELECT doc_id,
        |        unnest(list_transform(generate_series(1, len(a)-1),
        |                              i -> a[i] || ' ' || a[i+1])) AS bg
        |      FROM t WHERE len(a) >= 2),
        |f2 AS (SELECT bg, count(*) AS cnt2 FROM b GROUP BY 1),
        |f1 AS (SELECT string_split(bg, ' ')[1] AS w1,
        |         CAST(sum(cnt2) AS BIGINT) AS cnt1 FROM f2 GROUP BY 1),
        |m AS (SELECT f2.bg, f2.cnt2, f1.cnt1
        |      FROM f2 JOIN f1 ON string_split(f2.bg, ' ')[1] = f1.w1)
        |SELECT doc_id, count(*) AS n_bg,
        |  floor(CAST(sum(CAST(round(ln(CAST(cnt2 AS DOUBLE) / CAST(cnt1 AS DOUBLE)), 6)
        |                      AS DECIMAL(14,6))) AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4
        |    AS mean_logp
        |FROM b JOIN m USING (bg) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_trigram_backoff" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |tg AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(a)-2),
        |                               i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS tg
        |       FROM t WHERE len(a) >= 3),
        |trbg AS (SELECT unnest(list_transform(generate_series(1, len(a)-1),
        |                                      i -> a[i] || ' ' || a[i+1])) AS g
        |         FROM t WHERE doc_id % 2 = 0 AND len(a) >= 2),
        |trun AS (SELECT unnest(a) AS g FROM t WHERE doc_id % 2 = 0),
        |t3 AS (SELECT tg AS g, count(*) AS c3 FROM tg
        |       WHERE doc_id % 2 = 0 GROUP BY 1),
        |t2 AS (SELECT g, count(*) AS cb FROM trbg GROUP BY 1),
        |t1 AS (SELECT g, count(*) AS cu FROM trun GROUP BY 1),
        |tt AS (SELECT CAST(sum(cu) AS BIGINT) AS n, count(*) AS v FROM t1),
        |rows_ AS (SELECT doc_id, tg,
        |            string_split(tg, ' ')[1] || ' ' || string_split(tg, ' ')[2] AS ctx12,
        |            string_split(tg, ' ')[2] || ' ' || string_split(tg, ' ')[3] AS bg23,
        |            string_split(tg, ' ')[2] AS w2, string_split(tg, ' ')[3] AS w3
        |          FROM tg),
        |sc AS (SELECT r.doc_id, t3.c3, b23.cb AS c23,
        |         CASE WHEN t3.c3 IS NOT NULL
        |                THEN CAST(t3.c3 AS DOUBLE) / CAST(b12.cb AS DOUBLE)
        |              WHEN b23.cb IS NOT NULL
        |                THEN CAST(0.4 AS DOUBLE) * CAST(b23.cb AS DOUBLE)
        |                     / CAST(u2.cu AS DOUBLE)
        |              ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
        |                   * (CAST(coalesce(u3.cu, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |                   / (CAST(tt.n AS DOUBLE) + CAST(tt.v AS DOUBLE)) END AS p
        |       FROM rows_ r
        |       LEFT JOIN t3 ON t3.g = r.tg
        |       LEFT JOIN t2 b12 ON b12.g = r.ctx12
        |       LEFT JOIN t2 b23 ON b23.g = r.bg23
        |       LEFT JOIN t1 u2 ON u2.g = r.w2
        |       LEFT JOIN t1 u3 ON u3.g = r.w3
        |       CROSS JOIN tt)
        |SELECT doc_id, count(*) AS n_tg,
        |  CAST(sum(CASE WHEN c3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN c3 IS NULL AND c23 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bo1,
        |  CAST(sum(CASE WHEN c3 IS NULL AND c23 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bo2,
        |  floor(CAST(sum(CAST(round(ln(p), 6) AS DECIMAL(14,6))) AS DOUBLE)
        |        / count(*) * 1e4 + 0.5) / 1e4 AS mean_logp
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_quality_topquartile" ->
      s"""WITH q AS (SELECT doc_id, source, ${TextStats.qualitySql("text")} AS quality
         |           FROM documents),
         |r AS (SELECT doc_id, source, quality,
         |        percent_rank() OVER w AS pr, ntile(4) OVER w AS q4
         |      FROM q
         |      WINDOW w AS (PARTITION BY source ORDER BY quality DESC, doc_id ASC))
         |SELECT doc_id, source, quality, pr, CAST(q4 AS INT) AS q4
         |FROM r WHERE q4 = 1 ORDER BY doc_id""".stripMargin,
    // the exact heavy set is SQL; found=true is the sketch's
    // no-false-negative guarantee
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tt AS (SELECT tok FROM t WHERE tok <> ''),
        |n AS (SELECT count(*) AS c FROM tt)
        |SELECT tok, count(*) AS cnt, true AS found
        |FROM tt, n GROUP BY tok, n.c
        |HAVING count(*) > n.c / 40.0
        |ORDER BY tok""".stripMargin,
    "q_redact_terms" ->
      """SELECT doc_id,
        |  regexp_replace(text, '\b(customer|value|table)\b', '<TERM>', 'g') AS red_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_ensemble" ->
      s"""WITH t AS (SELECT doc_id, ${TextStats.qualitySql("text")} AS q,
         |             string_split(text, ' ') AS a
         |           FROM documents)
         |SELECT doc_id,
         |  q >= 0.5 AS q_ok,
         |  len(list_distinct(a)) * 2 >= len(a) AS rep_ok,
         |  len(a) BETWEEN 20 AND 1000 AS len_ok,
         |  CAST(CAST(q >= 0.5 AS INT) +
         |       CAST(len(list_distinct(a)) * 2 >= len(a) AS INT) +
         |       CAST(len(a) BETWEEN 20 AND 1000 AS INT) AS INT) AS votes,
         |  (CAST(q >= 0.5 AS INT) +
         |   CAST(len(list_distinct(a)) * 2 >= len(a) AS INT) +
         |   CAST(len(a) BETWEEN 20 AND 1000 AS INT)) >= 2 AS keep
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" ->
      """WITH p AS (SELECT doc_id,
        |  concat(coalesce(text, ''), ' contact user', CAST(doc_id AS VARCHAR),
        |         '@example.com at 10.0.', CAST(doc_id % 256 AS VARCHAR),
        |         '.7 or 555-01', lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')) AS ptext
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
        |FROM p ORDER BY doc_id""".stripMargin,
    // same planted literals as the Spark side (shared Scala arrays);
    // even docs' valid numbers redact, odd docs' near-misses survive
    "q_luhn_scrub" -> {
      val valid = Array("4111111111111111", "5555555555554444",
        "4012888888881881", "6011000990139424")
      val invalid = valid.map(v => v.init + ((v.last - '0' + 1) % 10).toString)
      def pickSql(arr: Array[String]) =
        s"""CASE doc_id % 4 WHEN 0 THEN '${arr(0)}' WHEN 1 THEN '${arr(1)}'
           |       WHEN 2 THEN '${arr(2)}' ELSE '${arr(3)}' END""".stripMargin
      s"""WITH p AS (SELECT doc_id,
         |  concat(regexp_replace(coalesce(text, ''), '[0-9]', 'x', 'g'), ' pay ',
         |    CASE WHEN doc_id % 2 = 0 THEN '[CARD]'
         |         ELSE ${pickSql(invalid)} END,
         |    ' ref ', CAST(doc_id AS VARCHAR)) AS expected
         |  FROM documents)
         |SELECT doc_id, md5(expected) AS scrub_md5,
         |  (doc_id % 2 = 0) AS redacted
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "q_vocab_topn" ->
      """SELECT tok, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |WHERE tok <> '' GROUP BY tok
        |ORDER BY cnt DESC, tok LIMIT 20""".stripMargin,
    "q_cms_heavy_hitters" -> cmsOracleSql("SELECT text FROM documents"),
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |w AS (SELECT doc_id, a,
        |        CASE WHEN len(a) >= 3
        |          THEN list_transform(generate_series(1, len(a)-2),
        |                 i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])
        |          ELSE []::VARCHAR[] END AS tri
        |      FROM t)
        |SELECT doc_id,
        |  cast(len(a) AS INT) AS n_tok,
        |  cast(len(list_distinct(a)) AS INT) AS n_tok_uniq,
        |  cast(len(tri) AS INT) AS n_tri,
        |  cast(len(list_distinct(tri)) AS INT) AS n_tri_uniq,
        |  (len(list_distinct(a)) * 2 < len(a)) AS repetitive
        |FROM w ORDER BY doc_id""".stripMargin,
    "q_data_quality" ->
      """SELECT count(*) AS n_rows,
        |  count(text) AS n_text_nonnull,
        |  count(DISTINCT doc_id) AS n_ids,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  (count(DISTINCT doc_id) = count(*)) AS id_unique,
        |  (count(text) = count(*)) AS text_complete,
        |  (min(n_chars) >= 1 AND max(n_chars) <= 100000) AS chars_in_range
        |FROM documents""".stripMargin,
    // the folded text stated analytically: precomposed éÅñüç and the
    // decomposed e+U+0301 all land on bare ASCII
    "q_ascii_fold" ->
      """SELECT doc_id,
        |  substr(text, 1, 56) || ' eAnuc e fin' AS folded_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the repaired text stated analytically: chr(195)||chr(169) (the
    // planted Ã©) must come back as chr(233) é, chr(194)||chr(176) as
    // chr(176) °, and clean rows byte-identical
    "q_fix_mojibake" ->
      """SELECT doc_id,
        |  substr(text, 1, 48) ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' caf' || chr(233) || ' n' || chr(176) || '7'
        |         ELSE ' ok' END AS fixed_text,
        |  (doc_id % 3 = 0) AS was_broken
        |FROM documents ORDER BY doc_id""".stripMargin,
    // DuckDB's utf8proc NFC vs the JDK Normalizer — both implement
    // UAX #15 canonical composition, so the planted sequences must
    // agree byte-for-byte (chr(769)=U+0301, 778=U+030A, 771=U+0303)
    "q_normalize_text" ->
      """WITH p AS (SELECT doc_id,
        |    substr(text, 1, 64) || ' e' || chr(769) || ' A' || chr(778) ||
        |    ' ' || chr(233) || ' n' || chr(771) AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm_text,
        |  CAST(length(raw) - length(nfc_normalize(raw)) AS INT) AS n_composed
        |FROM p ORDER BY doc_id""".stripMargin,
  )
}
