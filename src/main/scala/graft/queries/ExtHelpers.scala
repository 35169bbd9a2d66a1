package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextStats}

/** Shared planted fixtures, rate tables, and oracle-SQL generators for
  * the ExtQueries family files (split in round 12 with zero behavior
  * change). Each member is documented at its original definition.
  */
object ExtHelpers {

  /** Planted foreign-language tails for q_lang_mix — stopword-dense so
    * the half-document language ID detects them decisively; shared
    * verbatim with the oracle's CASE literals. */
  private[queries] val LangMixBlocks: Seq[(String, String)] = Seq(
    "de" -> "der die das und ist nicht der die das und",
    "fr" -> "le les et est une dans le les et est",
    "es" -> "el la los y es que el la los y")

  private[queries] val shingleCte =
    """WITH tok AS (SELECT doc_id, generate_subscripts(t,1) pos, unnest(t) w
      |             FROM (SELECT doc_id, string_split(text,' ') t FROM documents)),
      |sh AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
      |       FROM tok a JOIN tok b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
      |                  JOIN tok c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
      |sizes AS (SELECT doc_id, count(*) n_sh FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id i, b.doc_id j, count(*) c
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2)
      |""".stripMargin

  private[queries] val embedPairsOracle =
    """SELECT a.vec_id AS i, b.vec_id AS j,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
      |ORDER BY i, j""".stripMargin

  /** All-pairs oracle for the LSH near-dup query, over the SAME planted
    * corpus [[plantedNearDupCorpus]] builds on the Spark side. */
  private[queries] val embedPairsLshOracle =
    """WITH corpus AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x + 0.05)
      |  FROM embeddings)
      |SELECT a.vec_id AS i, b.vec_id AS j,
      |  round(list_cosine_similarity(a.v, b.v), 4) AS cos
      |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.9
      |ORDER BY i, j""".stripMargin

  /** The synthetic embeddings are (near-)random unit vectors — max
    * pairwise cosine ≈ 0.6 at sf0.1 — so the corpus contains NO true
    * near-duplicates at a realistic threshold, and at the noise floor
    * (cos ≥ 0.35) no sub-quadratic method can prune (that regime is
    * served exactly by `q_dedup_embed`'s brute force). To exercise the
    * LSH scale path at a threshold where it genuinely prunes (cos ≥
    * 0.9), the query corpus plants one deterministic near-duplicate per
    * vector: w = v + 0.05 per element → cos(v, w) ∈ [0.916, 0.954] on
    * unit vectors. The oracle constructs the identical corpus in SQL,
    * so the gate stays hash-exact. */
  private[graft] def plantedNearDupCorpus(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val planted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x.cast("double") + 0.05).as("embedding"))
    base.unionAll(planted)
  }

  private[queries] val jaccardOracle =
    shingleCte +
      """SELECT i, j, floor(c * 1.0 / (sa.n_sh + sb.n_sh - c) * 10000 + 0.5) / 10000 AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
        |WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.8
        |ORDER BY i, j""".stripMargin

  /** Df-capped mirror of [[jaccardOracle]]: candidates only from
    * shingles with df ≤ 20, full Jaccard on the survivors — the same
    * deliberate recall rule as `Dedup.jaccardPairsDfCapped`. */
  private[queries] val jaccardCappedOracle =
    shingleCte +
      """,dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
        |cand AS (SELECT DISTINCT a.doc_id i, b.doc_id j
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |         JOIN dfreq f ON f.s = a.s
        |         WHERE f.df <= 20),
        |cinter AS (SELECT c.i, c.j, count(*) cnt
        |           FROM cand c JOIN sh a ON a.doc_id = c.i
        |                       JOIN sh b ON b.doc_id = c.j AND b.s = a.s
        |           GROUP BY 1, 2)
        |SELECT i, j, floor(cnt * 1.0 / (sa.n_sh + sb.n_sh - cnt) * 10000 + 0.5) / 10000 AS jaccard
        |FROM cinter JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
        |WHERE cnt * 1.0 / (sa.n_sh + sb.n_sh - cnt) >= 0.8
        |ORDER BY i, j""".stripMargin

  /** The jaccard-threshold near-dup pair relation — chains after
    * [[shingleCte]]; the ONE definition every pair-consuming oracle
    * shares (a threshold/shingle change edits exactly here). */
  private[queries] val dpairsCte =
    """,dpairs AS (
      |  SELECT i, j FROM inter JOIN sizes sa ON sa.doc_id = i
      |                         JOIN sizes sb ON sb.doc_id = j
      |  WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.8)""".stripMargin

  /** [[dpairsCte]] plus the symmetric edge set and the recursive
    * reachability closure (`reach(id, lbl)`) — callers add their own
    * min-label aggregation. Requires the `WITH RECURSIVE` prefix. */
  private[queries] val reachCte =
    dpairsCte +
      """,
        |edges AS (SELECT i, j FROM dpairs UNION ALL SELECT j, i FROM dpairs),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.i, r.lbl FROM edges e JOIN reach r ON r.id = e.j)""".stripMargin

  /** Transitive closure over the jaccard-pair edges (recursive CTE) —
    * min reachable id per node = the cluster canonical. */
  private[queries] val clusterOracle =
    "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") + reachCte +
      """
        |SELECT id AS doc_id, min(lbl) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** [[clusterOracle]] extended with the keep-canonical policy: argmax
    * by (quality DESC, doc_id ASC) within each connected component —
    * the relational replay of minhashNearDups → clusterAssignments →
    * keep-best (q_dedup_minhash's own oracle proves the LSH pair set
    * equals this jaccard relation on this corpus). */
  private[queries] def keepCanonicalOracle: String =
    "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") + reachCte +
      s""",
         |clusters AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |scored AS (SELECT doc_id, ${TextStats.qualitySql("text")} AS quality
         |           FROM documents),
         |r AS (SELECT c.cluster_id, s.doc_id, s.quality,
         |        row_number() OVER (PARTITION BY c.cluster_id
         |          ORDER BY s.quality DESC, s.doc_id ASC) AS rn
         |      FROM clusters c JOIN scored s ON s.doc_id = c.id)
         |SELECT cluster_id, doc_id, quality FROM r WHERE rn = 1
         |ORDER BY cluster_id""".stripMargin

  /** Shared query construction for the two planted IVF serving
    * contracts (float + quantized): the first 50 corpus vectors under
    * a deterministic ±8% per-component md5 jitter, re-keyed to
    * vec_id + 1e6 — one definition so the contracts can never
    * silently diverge. See q_knn_ivf_planted's comment for why the
    * queries are planted rather than uniform. */
  private[queries] def plantedIvfQueries(emb: DataFrame): DataFrame = {
    val jitter = (i: org.apache.spark.sql.Column) =>
      (conv(substring(md5(concat_ws("_", col("vec_id"), i)), 1, 6), 16, 10)
        .cast("long") % 2001L - 1000L).cast("double") / 1000.0
    emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.08) * jitter(i))).as("embedding"))
  }


  /** Per-source keep-rates for the stratified-sample query: up-sample
    * the first five sources, mid-rate the next five, default the rest.
    * (Mirrored verbatim into the oracle SQL below.) */
  private[queries] val SampleRates: Map[String, Double] =
    ((0 to 4).map(i => s"src$i" -> 0.5) ++ (5 to 9).map(i => s"src$i" -> 0.25)).toMap

  /** Term-list redaction pattern — RE2-compatible so DuckDB agrees. */
  private[queries] val RedactPattern = "\\b(customer|value|table)\\b"

  /** 12 hours in epoch micros — both the q_range_join window span and
    * its bucket width (span == width keeps interval replication ≤ 2×). */
  private[queries] val RangeJoinWindowUs = 12L * 60 * 60 * 1000 * 1000

  /** Unrolled k-round BPE train+encode oracle. Each round recomputes
    * weighted pair counts over the current symbolization, takes the
    * SAME (cnt DESC, l, r) argmax as `Bpe.trainMerges`, and applies
    * the merge by literal `replace` over a bracketed ⟨STX⟩sym⟨ETX⟩
    * string: every symbol carries its own delimiter pair, so adjacent
    * merges share no characters and non-overlapping left-to-right
    * replace is exactly the trainer's greedy merge-skip-2 scan.
    * Tokens per word = the surviving ⟨STX⟩ count. */
  /** The k unrolled training rounds shared by [[bpeEncodeOracle]] and
    * [[tokenizePackOracle]]: `WITH w0 … w$k`, where w$k carries each
    * distinct word's final bracketed symbolization in `s`. */
  /** `rel` is the corpus relation the model trains on (a CTE name when
    * `pre` supplies leading CTEs — the pipeline oracle trains on its
    * filtered survivors, exactly like the engine side). */
  private def bpeRoundsCte(k: Int, rel: String = "documents",
                           pre: String = ""): String = {
    val sb = new StringBuilder
    sb.append("WITH " + pre +
      s"""w0 AS MATERIALIZED (SELECT w, count(*) AS wc,
        |    regexp_replace(w, '(.)', chr(2) || '\\1' || chr(3), 'g') AS s
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM $rel) t
        |  WHERE w <> '' GROUP BY w)""".stripMargin)
    for (t <- 1 to k) {
      val p = t - 1
      sb.append(s""",
        |p$t AS (SELECT l, r, sum(wc) AS cnt FROM (
        |    SELECT wc, syms[i] AS l, syms[i + 1] AS r
        |    FROM (SELECT wc, string_split(substr(s, 2, strlen(s) - 2),
        |                                  chr(3) || chr(2)) AS syms
        |          FROM w$p) q,
        |         unnest(generate_series(1, len(syms) - 1)) AS u(i)
        |  ) GROUP BY l, r),
        |m$t AS (SELECT l, r FROM p$t ORDER BY cnt DESC, l, r LIMIT 1),
        |w$t AS MATERIALIZED (SELECT w, wc, replace(s,
        |    coalesce(chr(2) || (SELECT l || chr(3) || chr(2) || r FROM m$t) || chr(3), chr(1)),
        |    coalesce(chr(2) || (SELECT l || r FROM m$t) || chr(3), chr(1))) AS s
        |  FROM w$p)""".stripMargin)
    }
    sb.toString
  }

  private[queries] def bpeEncodeOracle(k: Int): String = {
    val sb = new StringBuilder
    sb.append(bpeRoundsCte(k))
    sb.append(s""",
      |tok AS (SELECT w, strlen(s) - strlen(replace(s, chr(2), '')) AS n_tok FROM w$k),
      |wpd AS (SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> ''),
      |agg AS (SELECT doc_id, count(*) AS n_words, sum(n_tok) AS n_tokens
      |        FROM wpd JOIN tok USING (w) GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
      |       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens
      |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin)
    sb.toString
  }

  /** Token-id sequence packing oracle: the same k training rounds,
    * then w$k's bracketed symbolizations split into per-word symbol
    * LISTS, vocabulary ids assigned by symbol rank (code-point order
    * on both engines; EOS = 0 reserved), per-document token streams
    * rebuilt through the word join in (wpos, spos) order with one EOS
    * row per document, global positions via the per-doc-count prefix
    * sum, and position p → sequence p // L slot p % L — Spark's
    * two-level scan replayed as one window (the oracle can afford
    * it). */
  private[queries] def tokenizePackCtes(k: Int, seqLen: Int,
                                        rel: String = "documents",
                                        pre: String = ""): String =
    bpeRoundsCte(k, rel, pre) + s""",
      |syms AS (SELECT w, string_split(substr(s, 2, strlen(s) - 2),
      |                                chr(3) || chr(2)) AS sy FROM w$k),
      |vocab AS (SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS tid
      |          FROM (SELECT DISTINCT unnest(sy) AS sym FROM syms) v),
      |wids AS (SELECT q.w, q.i AS spos, vocab.tid
      |         FROM (SELECT w, i, sy[i] AS sym
      |               FROM syms, unnest(generate_series(1, len(sy))) AS u(i)) q
      |         JOIN vocab USING (sym)),
      |wpd AS (SELECT doc_id, i AS wpos, t[i] AS w
      |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM $rel) d,
      |             unnest(generate_series(1, len(t))) AS u(i)
      |        WHERE t[i] <> ''),
      |toks AS (SELECT doc_id, wpos, spos, tid FROM wpd JOIN wids USING (w)
      |         UNION ALL
      |         SELECT doc_id, 2147483647, 0, CAST(0 AS BIGINT) FROM $rel),
      |ord AS (SELECT doc_id, tid,
      |          row_number() OVER (PARTITION BY doc_id ORDER BY wpos, spos) AS ipos,
      |          count(*) OVER (PARTITION BY doc_id) AS nd
      |        FROM toks),
      |offs AS (SELECT doc_id, sum(nd) OVER (ORDER BY doc_id) - nd AS off
      |         FROM (SELECT DISTINCT doc_id, nd FROM ord) c),
      |gpos AS (SELECT o.tid, (f.off + o.ipos - 1) AS gp
      |         FROM ord o JOIN offs f USING (doc_id)),
      |seqs AS (SELECT CAST(gp // $seqLen AS BIGINT) AS seq_id,
      |                gp % $seqLen AS sp, tid FROM gpos)""".stripMargin

  /** Per-source BPE token counts (count per word occurrence = its
    * merged symbol count — ids are irrelevant to counting), as a
    * self-contained statement for nesting inside a derived table
    * (the fertility oracle — see
    * [[graft.ext.Unigram.tokenCountBySourceSql]]). */
  private[queries] def bpeTokenCountBySourceSql(
      k: Int, rel: String = "documents"): String =
    bpeRoundsCte(k, rel) + s""",
      |syms AS (SELECT w, string_split(substr(s, 2, strlen(s) - 2),
      |                                chr(3) || chr(2)) AS sy FROM w$k),
      |wpd AS (SELECT d.source, t[i] AS w
      |        FROM (SELECT source, string_split(text, ' ') AS t FROM $rel) d,
      |             unnest(generate_series(1, len(t))) AS u(i)
      |        WHERE t[i] <> '')
      |SELECT source, CAST(sum(len(sy)) AS BIGINT) AS t
      |FROM wpd JOIN syms USING (w) GROUP BY source""".stripMargin

  private[queries] def tokenizePackOracle(k: Int, seqLen: Int): String =
    tokenizePackCtes(k, seqLen) + s"""
      |SELECT seq_id, CAST(count(*) AS BIGINT) AS seq_len,
      |       CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |       md5(string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY sp)) AS ids_md5
      |FROM seqs GROUP BY seq_id ORDER BY seq_id""".stripMargin

  /** Streaming tokenize+pack oracle: the model trains on the full
    * corpus (the frozen-tokenizer split), documents stream in two
    * micro-batches (file a = even ids → bat 0, file b = odd ids →
    * bat 1), and packing is SCOPED per batch — every window below
    * partitions by `bat`, so each batch's sequences are exactly the
    * batch-local [[tokenizePackCtes]] arithmetic. */
  private[queries] def streamPackOracle(k: Int, seqLen: Int): String =
    bpeRoundsCte(k) + s""",
      |syms AS (SELECT w, string_split(substr(s, 2, strlen(s) - 2),
      |                                chr(3) || chr(2)) AS sy FROM w$k),
      |vocab AS (SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS tid
      |          FROM (SELECT DISTINCT unnest(sy) AS sym FROM syms) v),
      |wids AS (SELECT q.w, q.i AS spos, vocab.tid
      |         FROM (SELECT w, i, sy[i] AS sym
      |               FROM syms, unnest(generate_series(1, len(sy))) AS u(i)) q
      |         JOIN vocab USING (sym)),
      |wpd AS (SELECT doc_id, doc_id % 2 AS bat, i AS wpos, t[i] AS w
      |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d,
      |             unnest(generate_series(1, len(t))) AS u(i)
      |        WHERE t[i] <> ''),
      |toks AS (SELECT doc_id, bat, wpos, spos, tid FROM wpd JOIN wids USING (w)
      |         UNION ALL
      |         SELECT doc_id, doc_id % 2, 2147483647, 0, CAST(0 AS BIGINT)
      |         FROM documents),
      |ord AS (SELECT doc_id, bat, tid,
      |          row_number() OVER (PARTITION BY doc_id ORDER BY wpos, spos) AS ipos,
      |          count(*) OVER (PARTITION BY doc_id) AS nd
      |        FROM toks),
      |offs AS (SELECT doc_id, sum(nd) OVER (PARTITION BY bat ORDER BY doc_id) - nd AS off
      |         FROM (SELECT DISTINCT doc_id, bat, nd FROM ord) c),
      |gpos AS (SELECT o.bat, o.tid, (f.off + o.ipos - 1) AS gp
      |         FROM ord o JOIN offs f USING (doc_id)),
      |seqs AS (SELECT bat, CAST(gp // $seqLen AS BIGINT) AS seq_id,
      |                gp % $seqLen AS sp, tid FROM gpos)
      |SELECT CAST(bat AS BIGINT) AS bat, seq_id,
      |       CAST(count(*) AS BIGINT) AS seq_len,
      |       CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |       md5(string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY sp)) AS ids_md5
      |FROM seqs GROUP BY bat, seq_id ORDER BY bat, seq_id""".stripMargin

  /** End-to-end pretraining-pipeline oracle: Gopher structural gate →
    * exact dedup (keep lowest id per sha-256) → DROP
    * benchmark-contaminated docs (any shared 3-gram with the src0
    * benchmark — the q_decontaminate gram construction verbatim) →
    * BPE tokenize, model TRAINED ON THE SURVIVORS → fixed-length
    * packing. Every stage is individually oracle-verified; this
    * replays them composed, with the tokenizer rebuilt from the
    * filtered corpus exactly like the engine side. */
  /** The curation-funnel pre-stage CTE chain of the pretraining
    * pipeline oracles (Gopher gate → exact dedup → decontaminate),
    * ending in `kept` — shared by the BPE and unigram pipeline
    * variants so the funnel stages cannot drift between them. */
  private[queries] def pretrainKeptCtes: String = {
    val keep = graft.ext.CurationFilters.structuralKeepSql("text")
    s"""k1 AS (SELECT doc_id, text FROM documents
      |  WHERE source <> 'src0' AND ($keep)),
      |k2 AS (SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      |    FROM k1) WHERE rn = 1),
      |bg AS (SELECT DISTINCT array_to_string(toks[i : i + 2], ' ') AS g
      |       FROM (SELECT string_split(text, ' ') AS toks
      |             FROM documents WHERE source = 'src0'),
      |            unnest(CASE WHEN len(toks) >= 3 THEN generate_series(1, len(toks) - 2)
      |                        ELSE [] END) AS u(i)),
      |cont AS (SELECT DISTINCT doc_id
      |         FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM k2) c,
      |              unnest(CASE WHEN len(toks) >= 3 THEN generate_series(1, len(toks) - 2)
      |                          ELSE [] END) AS u(i)
      |         JOIN bg ON array_to_string(toks[i : i + 2], ' ') = bg.g),
      |kept AS MATERIALIZED (SELECT doc_id, text FROM k2
      |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
      |""".stripMargin
  }

  private[queries] def pretrainPipelineOracle(k: Int, seqLen: Int): String = {
    tokenizePackCtes(k, seqLen, rel = "kept", pre = pretrainKeptCtes) + s"""
      |SELECT seq_id, CAST(count(*) AS BIGINT) AS seq_len,
      |       CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |       md5(string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY sp)) AS ids_md5
      |FROM seqs GROUP BY seq_id ORDER BY seq_id""".stripMargin
  }

  /** [[tokenizePackOracle]] plus the attention-mask column: per slot,
    * the EXCLUSIVE running count of EOS tokens within the sequence —
    * a plain 1-PRECEDING window over the seqs relation. */
  private[queries] def packAttentionOracle(k: Int, seqLen: Int): String =
    tokenizePackCtes(k, seqLen) + s""",
      |di AS (SELECT seq_id, sp, tid,
      |         coalesce(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) OVER (
      |           PARTITION BY seq_id ORDER BY sp
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dx
      |       FROM seqs)
      |SELECT seq_id, CAST(count(*) AS BIGINT) AS seq_len,
      |       CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |       md5(string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY sp)) AS ids_md5,
      |       md5(string_agg(CAST(dx AS VARCHAR), ' ' ORDER BY sp)) AS doc_idx_md5
      |FROM di GROUP BY seq_id ORDER BY seq_id""".stripMargin

  /** Analytic CDC oracle: recompute every 8-byte window hash with the
    * SAME base-power coefficients as `CdcBoundaries.Pow`, mark
    * positions where `h % M % Mask == 0`, and rebuild the chunk
    * segments with lag() plus a per-doc tail. ASCII corpus ⇒ byte
    * positions and char positions coincide on both engines. */
  /** The shared boilerplate q_chunk_dedup appends to every document —
    * at a different offset per doc, which is exactly what CDC chunking
    * must shrug off. ASCII only, no quotes (interpolated into SQL). */
  private[graft] val CdcBoilerplate: String =
    " the quick brown fox jumps over the lazy dog while five boxing " +
      "wizards jump quickly and pack my box with five dozen liquor jugs " +
      "as bright vixens jump for the dozy fowl quacking in unison across " +
      "the silent field of waving grain under a pale morning sky that " +
      "slowly turns to gold while distant bells ring twice for the " +
      "turning of the tide and the long day closes"

  private[queries] def cdcCore(textExpr: String): String = {
    import graft.functions.CdcBoundaries.{M, Mask, Pow, W}
    val terms = (0 until W)
      .map(j => s"CAST(ord(substr(t, i - $j, 1)) AS BIGINT) * ${Pow(j)}")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, $textExpr AS t,
       |            strlen($textExpr) AS n FROM documents),
       |b AS (SELECT doc_id, i FROM d,
       |        unnest(generate_series($W, n)) AS u(i)
       |      WHERE ($terms) % $M % $Mask = 0),
       |mb AS (SELECT doc_id, max(i) AS mx FROM b GROUP BY doc_id),
       |segs AS (
       |  SELECT doc_id,
       |    coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s,
       |    i AS e
       |  FROM b
       |  UNION ALL
       |  SELECT d.doc_id, coalesce(mb.mx, 0) AS s, d.n AS e
       |  FROM d LEFT JOIN mb USING (doc_id) WHERE coalesce(mb.mx, 0) < d.n),
       |chunks AS (SELECT doc_id,
       |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
       |       AS INT) AS chunk_idx,
       |  CAST(s + 1 AS INT) AS "start", CAST(e - s AS INT) AS "len",
       |  md5(substr(t, s + 1, e - s)) AS chunk_md5
       |FROM segs JOIN d USING (doc_id))
       |""".stripMargin
  }

  private[queries] def cdcOracle: String =
    cdcCore("coalesce(text, '')") +
      "SELECT * FROM chunks ORDER BY doc_id, chunk_idx"

  /** Shared staged-CTE prefix of the funnel3 oracle (through g3,
    * the boilerplate gate): q_curation_funnel3 appends the
    * shuffle-order finale, q_funnel_provenance the
    * first-failing-stage verdict — one derivation, two finales. */
  private[queries] def funnel3StagesCte: String =
    s"""WITH b AS (SELECT doc_id, ${TextStats.normalizeSql("text")} AS norm
         |           FROM documents
         |           WHERE source IN ('src0','src1','src2','src3','src4')),
         |tr AS (SELECT doc_id, ${TextStats.normalizeSql("text")} AS norm
         |       FROM documents
         |       WHERE source NOT IN ('src0','src1','src2','src3','src4')),
         |dd AS (SELECT doc_id, norm FROM (
         |         SELECT doc_id, norm,
         |           row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
         |         FROM tr) t WHERE rn = 1),
         |qg AS (SELECT doc_id, norm FROM dd
         |       WHERE ${TextStats.qualitySql("norm")} >= 0.5),
         |ttok AS (SELECT doc_id, generate_subscripts(t,1) pos, unnest(t) w
         |         FROM (SELECT doc_id, string_split(norm,' ') t FROM qg)),
         |tsh AS (SELECT DISTINCT a.doc_id, a.w||' '||b.w||' '||c.w AS s
         |        FROM ttok a JOIN ttok b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
         |                    JOIN ttok c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
         |btok AS (SELECT doc_id, generate_subscripts(t,1) pos, unnest(t) w
         |         FROM (SELECT doc_id, string_split(norm,' ') t FROM b)),
         |bshd AS (SELECT DISTINCT a.doc_id, a.w||' '||b.w||' '||c.w AS s
         |         FROM btok a JOIN btok b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
         |                     JOIN btok c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
         |bset AS (SELECT DISTINCT s FROM bshd),
         |scr AS (SELECT doc_id FROM (
         |          SELECT a.doc_id, count(*) AS n_sh, count(bs.s) AS n_hit
         |          FROM tsh a LEFT JOIN bset bs USING (s) GROUP BY 1) t
         |        WHERE n_hit * 100 >= n_sh * 10),
         |s1 AS (SELECT doc_id, norm FROM qg
         |       WHERE doc_id NOT IN (SELECT doc_id FROM scr)),
         |tsz AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY 1),
         |bsz AS (SELECT doc_id, count(*) AS n FROM bshd GROUP BY 1),
         |nd AS (SELECT DISTINCT i.doc_id FROM (
         |         SELECT a.doc_id, x.doc_id AS j, count(*) AS c
         |         FROM tsh a JOIN bshd x ON a.s = x.s
         |         JOIN s1 ON s1.doc_id = a.doc_id
         |         GROUP BY a.doc_id, x.doc_id) i
         |       JOIN tsz ON tsz.doc_id = i.doc_id
         |       JOIN bsz ON bsz.doc_id = i.j
         |       WHERE i.c * 1.0 / (tsz.n + bsz.n - i.c) >= 0.8),
         |s2 AS (SELECT doc_id, norm FROM s1
         |       WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
         |d3 AS (SELECT doc_id, string_split(coalesce(norm,''),' ') AS arr FROM s2),
         |e3 AS (SELECT doc_id, arr,
         |         unnest(range(CAST(ceil(len(arr)/8.0) AS BIGINT))) AS seg
         |       FROM d3),
         |s3 AS (SELECT doc_id, seg,
         |         array_to_string(arr[(seg*8+1):(seg*8+8)],' ') AS segtext
         |       FROM e3),
         |f3 AS (SELECT segtext, count(DISTINCT doc_id) AS df FROM s3 GROUP BY 1),
         |k3 AS (SELECT s3.doc_id FROM s3 JOIN f3 USING (segtext) WHERE f3.df < 2),
         |c3 AS (SELECT doc_id, count(*) AS kept_segs FROM k3 GROUP BY 1),
         |t3 AS (SELECT doc_id, CAST(ceil(len(arr)/8.0) AS BIGINT) AS total_segs
         |       FROM d3),
         |g3 AS (SELECT t3.doc_id,
         |         CAST(coalesce(c3.kept_segs,0) AS BIGINT) AS kept_segs,
         |         t3.total_segs
         |       FROM t3 LEFT JOIN c3 USING (doc_id)
         |       WHERE coalesce(c3.kept_segs,0) > 0
         |         AND coalesce(c3.kept_segs,0)*2 >= t3.total_segs)""".stripMargin

}
