package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextStats}
import graft.queries.ExtHelpers._

/** Deduplication family: exact/minhash/simhash/embedding near-dup,
  * cluster ids, keep-best/canonical policies, line/paragraph/chunk
  * dedup, edit-distance verification.
  *
  * Split out of ExtQueries (round 12) with zero behavior change; keys
  * and oracle text are unchanged. Shared planted fixtures and oracle
  * generators live in [[ExtHelpers]].
  */
object DedupQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup -------------------------------------------------------
    "q_dedup_exact" -> ((s, d) => {
      Dedup.exactKeepFirst(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("fp"))
        .orderBy(col("doc_id"))
    }),
    "q_dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text", n = 3, minJ = 0.8)
        .orderBy(col("i"), col("j"))
    }),
    "q_dedup_minhash" -> ((s, d) => {
      Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text", n = 3, minJ = 0.8)
        .orderBy(col("i"), col("j"))
    }),
    // cross-source duplication accounting ("which sources copy from
    // which"): the sub-quadratic near-dup pair relation joined back to
    // each side's source, pair order normalized (least, greatest) so
    // the matrix is triangular whatever order the pair emitted in.
    // Shuffles: the pair path's own + two id-keyed joins against a
    // 2-column relation + a source²-bounded aggregate — the guidance
    // artifact for dedup policy and license review at corpus scale.
    "q_source_overlap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", n = 3, minJ = 0.8)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.as("sa"), col("i") === col("sa.doc_id"))
        .join(src.as("sb"), col("j") === col("sb.doc_id"))
        .select(least(col("sa.source"), col("sb.source")).as("src_a"),
          greatest(col("sa.source"), col("sb.source")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    // df-capped inverted index: candidates from shingles with df ≤ 20
    // only (boilerplate shingles carry no dedup signal but dominate
    // the Σdf² pair blowup), full Jaccard re-verified on survivors;
    // the oracle applies the identical df rule independently
    "q_dedup_ngram_capped" -> ((s, d) => {
      Dedup.jaccardPairsDfCapped(Tables.documents(s, d), "doc_id", "text",
          n = 3, minJ = 0.8, dfCap = 20)
        .orderBy(col("i"), col("j"))
    }),
    // SimHash is an engine-specific 64-bit signature (no SQL mirror
    // exists), so its gate is a PLANTED-DUPLICATE CONTRACT: the corpus
    // is tripled with (a) an exact copy of every doc — hamming 0, found
    // with certainty because the 8-chunk pigeonhole join is complete to
    // hamming 7 — and (b) a one-token-appended near-copy. A single
    // appended token flips exactly the bits whose bit-plane vote is at
    // a sign boundary, which on this 10-100-token corpus exceeds
    // hamming 7 for ~2% of docs (measured 97.6-98.2% detected at
    // sf0.001/0.01/0.1), so the near-dup half is an aggregate ≥95%
    // recall floor rather than a per-doc claim.
    "q_dedup_simhash" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs
        .unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionAll(docs.select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" xq")).as("text")))
      val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 7)
        .filter(col("i") < 1000000L)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val nExact = pairs.filter(col("j") === col("i") + 1000000L)
        .agg(count(lit(1)).as("n_exact"))
      val nPert = pairs.filter(col("j") === col("i") + 2000000L)
        .agg(count(lit(1)).as("n_pert"))
      nDocs.crossJoin(nExact).crossJoin(nPert).select(
        col("n_docs"),
        (col("n_exact") === col("n_docs")).as("exact_complete"),
        (col("n_pert") * 100 >= col("n_docs") * 95).as("pert_recall_ok"))
    }),
    "q_dedup_embed" -> ((s, d) => {
      Similarity.cosineNearDups(Tables.embeddings(s, d), "vec_id", "embedding", minCos = 0.35)
        .orderBy(col("i"), col("j"))
    }),
    // the scale path: LSH bucket candidates + exact cosine verify at a
    // genuine near-dup threshold (0.9) over the planted-dup corpus,
    // checked against its own all-pairs oracle on the same corpus
    "q_dedup_embed_lsh" -> ((s, d) => {
      Similarity.lshNearDups(plantedNearDupCorpus(Tables.embeddings(s, d)),
          "vec_id", "embedding", minCos = 0.9, planes = 16, tables = 128)
        .orderBy(col("i"), col("j"))
    }),

    // Embedding-space outlier detection — the vector-side data-quality
    // gate: squared distance to the corpus centroid, flagged when over
    // 2× the mean. Per-dimension means and per-vector distances follow
    // the decimal-sum discipline (order-free), so the verdict is
    // engine- and partitioning-exact. Shuffles bounded by n·dims
    // narrow rows; the centroid (dims rows) and the 1-row threshold
    // broadcast.
    "q_embed_outliers" -> ((s, d) => {
      val dims = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("i"),
          col("col").cast("double").as("x"))
      val centroid = dims.groupBy(col("i"))
        .agg(count(lit(1)).as("n"),
          sum((floor(col("x") * 1e6 + 0.5) / 1e6).cast("decimal(14,6)"))
            .as("sx"))
        .select(col("i"),
          (floor(col("sx").cast("double") / col("n") * 1e6 + 0.5) / 1e6)
            .as("m"))
      val dist = dims.join(broadcast(centroid), Seq("i"))
        .select(col("vec_id"),
          (floor((col("x") - col("m")) * (col("x") - col("m")) * 1e9 + 0.5)
            / 1e9).cast("decimal(18,9)").as("t9"))
        .groupBy(col("vec_id"))
        .agg((floor(sum(col("t9")).cast("double") * 1e6 + 0.5) / 1e6)
          .as("dist2"))
      val thr = dist.agg(count(lit(1)).as("nv"),
        sum((floor(col("dist2") * 1e6 + 0.5) / 1e6).cast("decimal(14,6)"))
          .as("sd"))
        .select((floor(col("sd").cast("double") / col("nv") * 2 * 1e6 + 0.5) / 1e6)
          .as("thr"))
      dist.crossJoin(broadcast(thr))
        .select(col("vec_id"), col("dist2"), col("thr"),
          (col("dist2") > col("thr")).as("is_outlier"))
        .orderBy(col("vec_id"))
    }),

    // cluster assignment after pairwise dedup: connected components of
    // the jaccard pairs via min-label propagation (O(diameter) rounds)
    "q_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJ = 0.8)
      Dedup.clusterAssignments(docs.select(col("doc_id")), "doc_id", pairs)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Dedup threshold-sensitivity sweep — the observability query
    // behind CHOOSING minJ: how many near-dup pairs survive at 0.7 /
    // 0.8 / 0.9, from ONE pair computation (conditional aggregation
    // over the floored Jaccard, no re-run per threshold). A cliff
    // between thresholds tells the curator the dedup verdict is
    // unstable; a plateau that it is safe.
    "q_dedup_threshold_sweep" -> ((s, d) => {
      val pairs = Dedup.jaccardPairs(Tables.documents(s, d),
        "doc_id", "text", n = 3, minJ = 0.7)
      pairs.agg(
        count(lit(1)).as("ge_70"),
        sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("ge_80"),
        sum(when(col("jaccard") >= 0.9, 1L).otherwise(0L)).as("ge_90"))
    }),

    // leakage-safe train/val/test split: the md5 selector draws on the
    // near-dup CLUSTER id, not the document id, so near-duplicates can
    // never straddle a split boundary (the train/test contamination
    // channel naive per-doc splits leave open). Same 80/10/10
    // thresholds as q_split_assign; the cluster relation is the
    // existing O(diameter) label propagation over compact (id,
    // cluster) rows — split assignment itself is map-only.
    "q_split_grouped" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJ = 0.8)
      val sel = graft.ext.Sampling.selector(col("cluster_id"))
      Dedup.clusterAssignments(docs.select(col("doc_id")), "doc_id", pairs)
        .withColumnRenamed("id", "doc_id")
        .select(col("doc_id"), col("cluster_id"),
          when(sel < lit(graft.ext.Sampling.thresholdHex(0.8)), "train")
            .when(sel < lit(graft.ext.Sampling.thresholdHex(0.9)), "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    }),

    // dedup observability: the duplicate-cluster SIZE histogram — the
    // number the curation report leads with (how many exact singletons
    // vs how much mass sits in big duplicate families decides whether
    // near-dedup is worth its cost on a corpus). Two count aggregates
    // over the compact (id, cluster) relation; text never moves.
    "q_dup_cluster_hist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJ = 0.8)
      Dedup.clusterAssignments(docs.select(col("doc_id")), "doc_id", pairs)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("sz"))
    }),

    // ---- SEMANTIC dedup clusters: embedding near-dup pairs → the
    // same min-label propagation as the text clusters (q_dedup_clusters
    // composes jaccard pairs; this composes cosine pairs — planted
    // corpus so the 0.9 threshold genuinely groups base+planted twins)
    "q_dedup_embed_clusters" -> ((s, d) => {
      val corpus = plantedNearDupCorpus(Tables.embeddings(s, d))
      val pairs = Similarity.cosineNearDups(corpus, "vec_id", "embedding",
        minCos = 0.9)
      Dedup.clusterAssignments(corpus.select(col("vec_id")), "vec_id",
          pairs.select(col("i"), col("j")))
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // Winnowing fingerprints are also engine-specific, but carry a
    // PROVABLE planted contract: every k-gram window of a document is
    // an identical window of that document extended with a suffix, so
    // fp(doc) ⊆ fp(doc ++ suffix) and the overlap coefficient
    // |A∩B|/min(|A|,|B|) = |A|/|A| is exactly 1.0 — per doc, not in
    // aggregate (all docs ≥ 44 chars > the w+k-1 = 23-char floor).
    "q_winnow_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.unionAll(
        docs.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zqx zqx zqx")).as("text")))
      val planted = graft.ext.Winnowing.overlapPairs(corpus, "doc_id", "text",
          minOverlap = 0.5)
        .filter(col("j") === col("i") + 1000000L)
      docs.select(col("doc_id"))
        .join(planted, col("doc_id") === col("i"), "left")
        .select(col("doc_id"),
          col("i").isNotNull.as("planted_found"),
          coalesce(col("overlap") === 1.0, lit(false)).as("overlap_exact"))
        .orderBy(col("doc_id"))
    }),

    // ---- incremental-ingest dedup (new batch vs existing corpus) ----
    // the cross-RUN sibling of q_dedup_exact: docs with doc_id%3==0
    // play the incoming batch, the rest the already-ingested corpus.
    // Bloom fast path: a !bloom_hit row is PROVABLY new (no false
    // negatives) and skips the join entirely; only bloom-hit rows —
    // true dups plus ≤fpp false positives — exact-anti-join the
    // existing fingerprints. At 100 TB the anti-join input shrinks
    // from |incoming| to |dups| + fpp·|incoming|; correctness rides on
    // the sketch's one-sided error, which is exactly what the oracle's
    // independent NOT IN evaluates.
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("fp", xxhash64(col("text")))
      val existing = docs.filter(col("doc_id") % 3 =!= 0).select(col("fp")).distinct()
      val incoming = docs.filter(col("doc_id") % 3 === 0)
      val screened = graft.ext.Bloom.screenByLongKey(incoming, existing, "fp")
      val provablyNew = screened.filter(!col("bloom_hit"))
      val survivors = screened.filter(col("bloom_hit"))
        .join(existing, Seq("fp"), "left_anti")
      provablyNew.unionByName(survivors)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    // canonical-form ("fuzzy-as-exact") dedup: normalize casing /
    // punctuation / spacing, then plain exact dedup on the canonical
    // string — map-only normalization + the one sha-256 shuffle. The
    // lowercase corpus normalizes to itself, so the query plants an
    // UPPERCASED-and-punctuated variant per doc; every variant must
    // collapse onto its original (the smaller id wins keep-first)
    "q_dedup_canonical" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val variant = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        TextStats.plantedVariantCol(col("text")).as("text"))
      val canon = docs.unionByName(variant)
        .withColumn("norm", TextStats.normalizeCol(col("text")))
      Dedup.exactKeepFirst(canon, "doc_id", "norm")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),
    // keep-BEST dedup: within each canonical group keep the highest
    // raw-quality copy (not the earliest) — the planted variants carry
    // extra punctuation, so raw quality genuinely differs inside each
    // group and the policy is exercised, not vacuous
    "q_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val variant = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        TextStats.plantedVariantCol(col("text")).as("text"))
      val corpus = docs.unionByName(variant)
        .withColumn("norm", TextStats.normalizeCol(col("text")))
        .withColumn("quality", TextStats.qualityCol(col("text")))
      Dedup.exactKeepBest(corpus, "doc_id", "norm", "quality")
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    }),
    // the FULL production near-dedup policy, composed end-to-end from
    // three individually-verified operators: MinHash+LSH near-dup
    // pairs (sub-quadratic candidates, exact-Jaccard verified) →
    // connected-component cluster ids (min-label propagation) → keep
    // the highest-quality member per cluster (id ascending as the
    // tie-break). One row per cluster; singleton docs are their own
    // cluster and survive unconditionally. The oracle replays the
    // identical pipeline relationally: jaccard relation → recursive-CTE
    // closure → argmax by (quality DESC, doc_id ASC).
    "q_dedup_keep_canonical" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", n = 3, minJ = 0.8)
      val clusters = Dedup.clusterAssignments(docs.select(col("doc_id")), "doc_id",
        pairs.select(col("i"), col("j")))
      val scored = docs.select(col("doc_id"),
        TextStats.qualityCol(col("text")).as("quality"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      scored.join(clusters, scored("doc_id") === clusters("id"))
        .select(col("cluster_id"), col("doc_id"), col("quality"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy(col("cluster_id"))
    }),
    // cross-document boilerplate removal (CCNet-style line-level dedup
    // over fixed 8-token segments): df counted over 16-byte hashed
    // rows, boilerplate set broadcast anti-joined — candidate text
    // never shuffles for the filter; the one full-width shuffle is the
    // inherent reassembly groupBy(id)
    "q_line_dedup" -> ((s, d) => {
      graft.ext.Boilerplate.dropRepeatedSegments(Tables.documents(s, d),
          "doc_id", "text", segTokens = 8, maxDf = 2)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),
    // WITHIN-document repeated-paragraph removal (the copy-paste-tail
    // artifact): the corpus text has no native intra-doc repeats, so
    // the query plants them — each doc's first two 6-token segments
    // are appended again at the tail — and the operator must drop
    // exactly the planted repeats, keeping first occurrences in
    // order. Entirely map-only: segmentation, planting, and the
    // keep-first distinct are one projection; no Generate, no shuffle,
    // text never moves — the per-doc form line_dedup's cross-doc df
    // count cannot take
    "q_para_dedup" -> ((s, d) => {
      // tokens, then segments, then the planted array each materialize
      // before their consumers reference them (interpreted-HOF
      // re-evaluation — the LinearGate trap; segs was re-derived 4×)
      val segs = col("__segs")
      Tables.documents(s, d)
        .withColumn("__toks", split(coalesce(col("text"), lit("")), " "))
        .withColumn("__segs",
          graft.ext.Boilerplate.segmentArray(col("__toks"), segTokens = 6))
        .withColumn("psegs",
          when(size(segs) >= 2, concat(segs, slice(segs, 1, 2)))
            .otherwise(segs))
        .withColumn("__kept",
          graft.ext.Boilerplate.keepFirstDistinct(col("psegs")))
        .select(col("doc_id"),
          concat_ws(" ", col("__kept")).as("clean_text"),
          size(col("psegs")).as("n_segs"),
          size(col("__kept")).as("kept_segs"))
        .orderBy(col("doc_id"))
    }),

    // Chunk-level dedup — CDC's payoff: the SAME ~360-char boilerplate
    // is appended to every document at a DIFFERENT byte offset (each
    // doc's own length shifts it), and content-defined boundaries
    // still align inside it after one 8-byte window of context, so its
    // interior chunks hash identically across all docs and surface as
    // shared chunks (fixed-size windows would find zero — alignment is
    // lost after the first length difference). One shuffle on 16-byte
    // (md5, id) rows; chunk text never moves.
    "q_chunk_dedup" -> ((s, d) => {
      val planted = Tables.documents(s, d)
        .withColumn("ptext",
          concat(coalesce(col("text"), lit("")), lit(CdcBoilerplate)))
      graft.ext.Chunking.cdcChunks(planted, "doc_id", "ptext")
        .groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("len")).as("len"))
        .filter(col("n_copies") >= 2)
        .orderBy(col("n_copies").desc, col("chunk_md5"))
    }),

    // Edit-distance near-dup verification: the MinHash/LSH candidate
    // pairs (sub-quadratic) re-verified with EXACT Levenshtein — the
    // character-level confirmation pass a dedup policy runs when token
    // Jaccard alone is too coarse (reorderings score high on Jaccard
    // but far on edit distance). Candidates only — Levenshtein is
    // O(len²) per pair and must never see the full corpus; the flag is
    // the integer compare dist·10 ≤ max(len) (edit similarity ≥ 0.9).
    "q_dedup_editdist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text")
        .select(col("i"), col("j"))
      val a = docs.select(col("doc_id").as("i"), col("text").as("__ta"))
      val b = docs.select(col("doc_id").as("j"), col("text").as("__tb"))
      pairs.join(a, "i").join(b, "j")
        .select(col("i"), col("j"),
          levenshtein(col("__ta"), col("__tb")).as("edit_dist"),
          (levenshtein(col("__ta"), col("__tb")) * 10 <=
            greatest(length(col("__ta")), length(col("__tb"))))
            .as("edit_dup"))
        .orderBy(col("i"), col("j"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT doc_id, fp FROM (
        |  SELECT doc_id, sha256(text) AS fp,
        |         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram_jaccard" -> jaccardOracle,
    // LSH candidate recall at J≥0.8 with 16 bands × 4 rows is
    // 1-(1-J^4)^16 > 1-1e-21 on this corpus — the verified MinHash
    // output equals the exact all-pairs result (checked at sf0.01).
    "q_dedup_minhash" -> jaccardOracle,
    "q_source_overlap" -> (ExtHelpers.shingleCte + ExtHelpers.dpairsCte +
      """,
        |m AS (
        |  SELECT least(da.source, db.source) AS src_a,
        |         greatest(da.source, db.source) AS src_b
        |  FROM dpairs JOIN documents da ON da.doc_id = i
        |              JOIN documents db ON db.doc_id = j)
        |SELECT src_a, src_b, count(*) AS n_pairs
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "q_dedup_ngram_capped" -> jaccardCappedOracle,
    // planted-duplicate contracts for the engine-specific-hash dedup
    // ops (see the query scaladocs for why each bound is what it is)
    "q_dedup_simhash" ->
      """SELECT count(*) AS n_docs, true AS exact_complete, true AS pert_recall_ok
        |FROM documents""".stripMargin,
    "q_dedup_embed" -> embedPairsOracle,
    // the LSH+verify path must reproduce the exact all-pairs result at
    // its own threshold over the planted-dup corpus
    "q_dedup_embed_lsh" -> embedPairsLshOracle,
    "q_embed_outliers" ->
      """WITH dims AS (
        |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, embedding
        |  FROM embeddings),
        |dx AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM dims),
        |centroid AS (
        |  SELECT i,
        |    floor(CAST(sum(CAST(floor(x * 1e6 + 0.5) / 1e6 AS DECIMAL(14,6)))
        |               AS DOUBLE)
        |          / count(*) * 1e6 + 0.5) / 1e6 AS m
        |  FROM dx GROUP BY 1),
        |dist AS (
        |  SELECT vec_id,
        |    floor(CAST(sum(CAST(floor((x - m) * (x - m) * 1e9 + 0.5) / 1e9
        |                        AS DECIMAL(18,9)))
        |               AS DOUBLE) * 1e6 + 0.5) / 1e6 AS dist2
        |  FROM dx JOIN centroid USING (i) GROUP BY 1),
        |thr AS (
        |  SELECT floor(CAST(sum(CAST(floor(dist2 * 1e6 + 0.5) / 1e6
        |                             AS DECIMAL(14,6)))
        |               AS DOUBLE) / count(*) * 2 * 1e6 + 0.5) / 1e6 AS thr
        |  FROM dist)
        |SELECT vec_id, dist2, thr, (dist2 > thr) AS is_outlier
        |FROM dist CROSS JOIN thr ORDER BY vec_id""".stripMargin,
    "q_dedup_clusters" -> clusterOracle,
    // same raw-J ≥ 0.7 filter, same floor4 presentation, conditional
    // counts cast to BIGINT (DuckDB integer sums are HUGEINT)
    "q_dedup_threshold_sweep" ->
      (shingleCte +
        """,p AS (SELECT i, j,
          |        floor(c * 1.0 / (sa.n_sh + sb.n_sh - c) * 1e4 + 0.5) / 1e4 AS j4
          |      FROM inter JOIN sizes sa ON sa.doc_id = i
          |                 JOIN sizes sb ON sb.doc_id = j
          |      WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.7)
          |SELECT CAST(count(*) AS BIGINT) AS ge_70,
          |  CAST(sum(CASE WHEN j4 >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS ge_80,
          |  CAST(sum(CASE WHEN j4 >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS ge_90
          |FROM p""".stripMargin),
    // the cluster CTE plus the q_split_assign threshold CASE, keyed on
    // cluster_id instead of doc_id
    "q_split_grouped" ->
      ("WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") +
        ExtHelpers.reachCte +
        """,
          |clusters AS (SELECT id AS doc_id, min(lbl) AS cluster_id
          |             FROM reach GROUP BY id)
          |SELECT doc_id, cluster_id,
          |  CASE WHEN md5(CAST(cluster_id AS VARCHAR)) < 'cccccccd' THEN 'train'
          |       WHEN md5(CAST(cluster_id AS VARCHAR)) < 'e6666666' THEN 'val'
          |       ELSE 'test' END AS split
          |FROM clusters ORDER BY doc_id""".stripMargin),
    // the same transitive closure, re-aggregated to the size histogram
    "q_dup_cluster_hist" ->
      s"""WITH c AS ($clusterOracle)
         |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters FROM (
         |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
         |  FROM c GROUP BY 1)
         |GROUP BY sz ORDER BY sz""".stripMargin,
    // semantic clusters: recursive closure over the SAME planted-corpus
    // cosine edges q_dedup_embed_lsh proves hash-exact
    "q_dedup_embed_clusters" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x + 0.05)
        |  FROM embeddings),
        |dpairs AS (SELECT a.vec_id AS i, b.vec_id AS j FROM corpus a JOIN corpus b
        |           ON a.vec_id < b.vec_id
        |           WHERE list_cosine_similarity(a.v, b.v) >= 0.9),
        |edges AS (SELECT i, j FROM dpairs UNION ALL SELECT j, i FROM dpairs),
        |reach(id, lbl) AS (
        |  SELECT vec_id, vec_id FROM corpus
        |  UNION
        |  SELECT e.i, r.lbl FROM edges e JOIN reach r ON r.id = e.j)
        |SELECT id AS vec_id, min(lbl) AS cluster_id
        |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin,
    "q_winnow_pairs" ->
      """SELECT doc_id, true AS planted_found, true AS overlap_exact
        |FROM documents ORDER BY doc_id""".stripMargin,
    // independent evaluation: plain NOT IN against the existing texts
    "q_dedup_incremental" ->
      """SELECT doc_id FROM documents
        |WHERE doc_id % 3 = 0
        |  AND text NOT IN (SELECT text FROM documents WHERE doc_id % 3 <> 0)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_canonical" ->
      s"""WITH c AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, ${TextStats.plantedVariantSql("text")}
         |  FROM documents),
         |n AS (SELECT doc_id, ${TextStats.normalizeSql("text")} AS norm
         |      FROM c),
         |r AS (SELECT doc_id,
         |        row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
         |      FROM n)
         |SELECT doc_id FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_keep_best" ->
      s"""WITH c AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, ${TextStats.plantedVariantSql("text")}
         |  FROM documents),
         |q AS (SELECT doc_id, ${TextStats.normalizeSql("text")} AS norm,
         |        ${TextStats.qualitySql("text")} AS quality
         |      FROM c),
         |r AS (SELECT doc_id, quality,
         |        row_number() OVER (PARTITION BY norm
         |          ORDER BY quality DESC, doc_id ASC) AS rn
         |      FROM q)
         |SELECT doc_id, quality FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_keep_canonical" -> keepCanonicalOracle,
    "q_line_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(coalesce(text,''),' ') AS arr
        |           FROM documents),
        |e AS (SELECT doc_id, arr,
        |        unnest(range(CAST(ceil(len(arr)/8.0) AS BIGINT))) AS seg
        |      FROM d),
        |s AS (SELECT doc_id, seg,
        |        array_to_string(arr[(seg*8+1):(seg*8+8)],' ') AS segtext
        |      FROM e),
        |f AS (SELECT segtext, count(DISTINCT doc_id) AS df FROM s GROUP BY 1),
        |k AS (SELECT s.doc_id, s.seg, s.segtext
        |      FROM s JOIN f USING (segtext) WHERE f.df < 2),
        |c AS (SELECT doc_id, string_agg(segtext,' ' ORDER BY seg) AS clean_text,
        |        count(*) AS kept_segs FROM k GROUP BY 1),
        |t AS (SELECT doc_id, count(*) AS total_segs FROM s GROUP BY 1)
        |SELECT t.doc_id, coalesce(c.clean_text,'') AS clean_text,
        |  CAST(coalesce(c.kept_segs,0) AS BIGINT) AS kept_segs,
        |  CAST(t.total_segs AS BIGINT) AS total_segs
        |FROM t LEFT JOIN c USING (doc_id) ORDER BY t.doc_id""".stripMargin,
    "q_para_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(coalesce(text,''),' ') AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, toks,
        |        CAST(ceil(len(toks)/6.0) AS BIGINT) AS nseg FROM d),
        |s AS (SELECT doc_id,
        |        list_transform(range(nseg),
        |          i -> array_to_string(toks[(i*6+1):(i*6+6)], ' ')) AS segs
        |      FROM g),
        |p AS (SELECT doc_id,
        |        CASE WHEN len(segs) >= 2 THEN list_concat(segs, segs[1:2])
        |             ELSE segs END AS psegs FROM s),
        |u AS (SELECT doc_id, psegs, unnest(range(len(psegs))) AS i FROM p),
        |e AS (SELECT doc_id, i, psegs[i+1] AS seg, len(psegs) AS n FROM u),
        |r AS (SELECT doc_id, i, seg, n,
        |        row_number() OVER (PARTITION BY doc_id, seg ORDER BY i) AS rn
        |      FROM e)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY i),
        |           '') AS clean_text,
        |  CAST(max(n) AS INT) AS n_segs,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS kept_segs
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the same window-hash replay over text+boilerplate, aggregated to
    // the shared-chunk relation — every doc's interior boilerplate
    // chunks must hash identically despite per-doc offsets
    "q_chunk_dedup" ->
      (cdcCore(s"coalesce(text, '') || '$CdcBoilerplate'") +
        """SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_copies,
          |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          |  CAST(min("len") AS INT) AS "len"
          |FROM chunks GROUP BY chunk_md5 HAVING count(*) >= 2
          |ORDER BY n_copies DESC, chunk_md5""".stripMargin),
    // LSH candidates (the 0.8-Jaccard relation both engines already
    // pin) re-verified with DuckDB's independent Levenshtein
    "q_dedup_editdist" ->
      (shingleCte +
        """,pairs AS (SELECT i, j
          |          FROM inter JOIN sizes sa ON sa.doc_id = i
          |                     JOIN sizes sb ON sb.doc_id = j
          |          WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.8)
          |SELECT p.i, p.j,
          |  CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist,
          |  (levenshtein(da.text, db.text) * 10 <=
          |     greatest(length(da.text), length(db.text))) AS edit_dup
          |FROM pairs p JOIN documents da ON da.doc_id = p.i
          |             JOIN documents db ON db.doc_id = p.j
          |ORDER BY i, j""".stripMargin),
  )
}
