package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextStats}

/** The training-data-pipeline extension operators (BASELINE.json north
  * star): dedup, similarity search, text analysis, multimodal — each as
  * a verifiable query. Shared shingle/token/hash semantics are defined
  * once in graft.ext and mirrored into the DuckDB oracles.
  */
object ExtQueries {

  /** Planted foreign-language tails for q_lang_mix — stopword-dense so
    * the half-document language ID detects them decisively; shared
    * verbatim with the oracle's CASE literals. */
  private[queries] val LangMixBlocks: Seq[(String, String)] = Seq(
    "de" -> "der die das und ist nicht der die das und",
    "fr" -> "le les et est une dans le les et est",
    "es" -> "el la los y es que el la los y")

  private val shingleCte =
    """WITH tok AS (SELECT doc_id, generate_subscripts(t,1) pos, unnest(t) w
      |             FROM (SELECT doc_id, string_split(text,' ') t FROM documents)),
      |sh AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
      |       FROM tok a JOIN tok b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
      |                  JOIN tok c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
      |sizes AS (SELECT doc_id, count(*) n_sh FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id i, b.doc_id j, count(*) c
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2)
      |""".stripMargin

  private val embedPairsOracle =
    """SELECT a.vec_id AS i, b.vec_id AS j,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
      |ORDER BY i, j""".stripMargin

  /** All-pairs oracle for the LSH near-dup query, over the SAME planted
    * corpus [[plantedNearDupCorpus]] builds on the Spark side. */
  private val embedPairsLshOracle =
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

  private val jaccardOracle =
    shingleCte +
      """SELECT i, j, floor(c * 1.0 / (sa.n_sh + sb.n_sh - c) * 10000 + 0.5) / 10000 AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
        |WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.8
        |ORDER BY i, j""".stripMargin

  /** Df-capped mirror of [[jaccardOracle]]: candidates only from
    * shingles with df ≤ 20, full Jaccard on the survivors — the same
    * deliberate recall rule as `Dedup.jaccardPairsDfCapped`. */
  private val jaccardCappedOracle =
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

  /** Transitive closure over the jaccard-pair edges (recursive CTE) —
    * min reachable id per node = the cluster canonical. */
  private val clusterOracle =
    "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") +
      """,dpairs AS (
        |  SELECT i, j FROM inter JOIN sizes sa ON sa.doc_id = i
        |                         JOIN sizes sb ON sb.doc_id = j
        |  WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.8),
        |edges AS (SELECT i, j FROM dpairs UNION ALL SELECT j, i FROM dpairs),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.i, r.lbl FROM edges e JOIN reach r ON r.id = e.j)
        |SELECT id AS doc_id, min(lbl) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** [[clusterOracle]] extended with the keep-canonical policy: argmax
    * by (quality DESC, doc_id ASC) within each connected component —
    * the relational replay of minhashNearDups → clusterAssignments →
    * keep-best (q_dedup_minhash's own oracle proves the LSH pair set
    * equals this jaccard relation on this corpus). */
  private def keepCanonicalOracle: String =
    "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") +
      s""",dpairs AS (
         |  SELECT i, j FROM inter JOIN sizes sa ON sa.doc_id = i
         |                         JOIN sizes sb ON sb.doc_id = j
         |  WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.8),
         |edges AS (SELECT i, j FROM dpairs UNION ALL SELECT j, i FROM dpairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.i, r.lbl FROM edges e JOIN reach r ON r.id = e.j),
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
  private def plantedIvfQueries(emb: DataFrame): DataFrame = {
    val jitter = (i: org.apache.spark.sql.Column) =>
      (conv(substring(md5(concat_ws("_", col("vec_id"), i)), 1, 6), 16, 10)
        .cast("long") % 2001L - 1000L).cast("double") / 1000.0
    emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.08) * jitter(i))).as("embedding"))
  }

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

    // ---- similarity search ------------------------------------------
    "q_knn_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, k = 5)
        .orderBy(col("qid"), col("rank"))
    }),
    // ANN queries declare their RECALL CONTRACT vs the in-plan exact
    // top-k: per-query `recall_ok` booleans the DuckDB oracle asserts.
    // Hyperplanes are deterministic, so the booleans are reproducible
    // on a fixed corpus; planes=4 × tables=32 measures ≥4/5 true
    // neighbors recovered per query at sf0.001/0.01/0.1.
    "q_knn_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      val ann = Similarity.lshTopK(emb, "vec_id", "embedding", queries,
        k = 5, planes = 4, tables = 32)
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, k = 5)
      Similarity.recallAtK(ann, brute, k = 5, minRecall = 0.8)
        .orderBy(col("qid"))
    }),

    // top-k over the QUANTIZED store: both sides int8 (the 100 TB
    // serving shape — ×4 less IO; cosine is scale-invariant so the
    // integer vectors score directly), recall contract vs the exact
    // float top-k. Quantization distorts cosine by O(1/254)/element,
    // far below this corpus's neighbor gaps → deterministic booleans.
    "q_knn_quantized" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val quant = graft.ext.Quantize.int8(emb, "embedding")
        .select(col("vec_id"), col("qvec"))
      val queries = quant.filter(col("vec_id") < 10)
      val annQ = Similarity.bruteForceTopK(quant, "vec_id", "qvec", queries, k = 5)
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), k = 5)
      Similarity.recallAtK(annQ, brute, k = 5, minRecall = 0.8)
        .orderBy(col("qid"))
    }),

    // IVF probes its persisted index (train-once: buildIndex is a
    // _SUCCESS-guarded no-op after the first call; topKIndexed has no
    // count/collect — the scan prunes to probed cells via DPP). The
    // uniform-random corpus is IVF's adversarial case (true neighbors
    // scatter across cells: one query's 5-NN set plateaus at 3/5 even
    // probing 12 of 16 cells), so the honest contract here is
    // recall ≥ 0.6 at nProbe=8 — measured stable at sf0.001/0.01/0.1.
    "q_knn_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      val idxDir = graft.ext.Ivf.indexDirFor(d, k = 16, iters = 2)
      graft.ext.Ivf.buildIndex(emb, "vec_id", "embedding", idxDir, k = 16, iters = 2)
      val ann = graft.ext.Ivf.topKIndexed(s, idxDir, queries,
        "vec_id", "embedding", k = 5, nProbe = 8)
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, k = 5)
      Similarity.recallAtK(ann, brute, k = 5, minRecall = 0.6)
        .orderBy(col("qid"))
    }),

    // IVF at its SERVING shape: real ANN queries are near the corpus
    // manifold (a perturbed document, a paraphrase embedding), not
    // fresh isotropic noise. Each query is a corpus vector under a
    // deterministic ±8% per-component hash jitter (cos(q, source)
    // ≈ 0.999 vs a corpus-wide max inter-vector cosine of ~0.51), and
    // the contract is exact: the top-1 through the inverted file IS
    // the planted source, per query, probing nProbe=4 of 16 cells —
    // 25% of the index. (Raising the UNIFORM-query recall@5 contract
    // to 0.9 at ≤25% probing is not achievable on this corpus: the
    // embeddings are isotropic — mean pairwise cosine 0.00, p99 0.29 —
    // so "true" 5-NN sets are noise-level and any IVF's recall tracks
    // its scan fraction; the 0.6-at-50% contract above is the honest
    // adversarial bound, this query is the honest serving bound.)
    "q_knn_ivf_planted" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = plantedIvfQueries(emb)
      val idxDir = graft.ext.Ivf.indexDirFor(d, k = 16, iters = 2)
      graft.ext.Ivf.buildIndex(emb, "vec_id", "embedding", idxDir, k = 16, iters = 2)
      graft.ext.Ivf.topKIndexed(s, idxDir, queries,
          "vec_id", "embedding", k = 1, nProbe = 4)
        .filter(col("rank") === 1)
        .select(col("qid"), (col("nid") === col("qid") - 1000000L).as("top1_ok"))
        .orderBy(col("qid"))
    }),

    // the QUANTIZED serving path — q_knn_ivf_planted's contract through
    // the int8 index: first-pass scoring reads only array<tinyint>
    // vectors (≈⅛ the index bytes/IO), survivors re-rank in float
    // against the lake by id. Same planted top-1-exact gate at the
    // same 25% probe fraction — the quantization error (O(1/254) per
    // element) must vanish under the ~0.49 cosine margin between each
    // query's source and the rest of the corpus.
    "q_knn_ivf_quantized" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = plantedIvfQueries(emb)
      val idxDir = graft.ext.Ivf.quantizedIndexDirFor(d, k = 16, iters = 2)
      graft.ext.Ivf.buildQuantizedIndex(emb, "vec_id", "embedding", idxDir,
        k = 16, iters = 2)
      graft.ext.Ivf.topKQuantized(s, idxDir, emb, queries,
          "vec_id", "embedding", k = 1, nProbe = 4, rerank = 4)
        .filter(col("rank") === 1)
        .select(col("qid"), (col("nid") === col("qid") - 1000000L).as("top1_ok"))
        .orderBy(col("qid"))
    }),

    // the PRODUCT-QUANTIZED serving path — the deepest compression
    // tier of the same planted contract: the index stores only an
    // m=8-byte code word + reconstruction norm per vector (~32× under
    // the float index, ~4× under int8 — the layout where a 10⁹-vector
    // index fits cluster page cache), candidates score via codegen'd
    // ADC table lookups (PqAdc — m reads, no dim-length arithmetic),
    // and the k·rerank survivor pool re-ranks in float against the
    // lake. PQ reconstruction error is LARGE on an isotropic corpus
    // (16 centroids per 8-dim subspace), which is exactly why the
    // serving shape pairs it with a float re-rank: the planted source
    // only has to survive into the top-4 of the probed cells, and the
    // re-rank restores exactness.
    "q_knn_ivf_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = plantedIvfQueries(emb)
      val idxDir = graft.ext.Ivf.pqIndexDirFor(d, k = 16, iters = 2)
      graft.ext.Ivf.buildPqIndex(emb, "vec_id", "embedding", idxDir,
        k = 16, iters = 2)
      graft.ext.Ivf.topKPq(s, idxDir, emb, queries,
          "vec_id", "embedding", k = 1, nProbe = 4, rerank = 4)
        .filter(col("rank") === 1)
        .select(col("qid"), (col("nid") === col("qid") - 1000000L).as("top1_ok"))
        .orderBy(col("qid"))
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

    // ---- dataset versioning checksum --------------------------------
    // Order-insensitive per-source content signature: bit_xor over a
    // 60-bit prefix of each document's md5. XOR is commutative +
    // associative, so the aggregate is partial-aggregable and
    // arrival-order-free — the cheap "did ANY byte of this 100 TB
    // partition change" primitive behind dataset version manifests.
    // (60 bits = 15 hex chars keeps the value in a signed long for
    // both engines; md5 hex is byte-identical Spark/DuckDB.)
    "q_corpus_checksum" -> ((s, d) => {
      val h = conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
      Tables.documents(s, d).select(col("source"), h.as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(h)").as("xor_sig"))
        .orderBy(col("source"))
    }),

    // Z-order (Morton) clustering key — the lakehouse layout primitive:
    // interleaving the bits of two scan dimensions gives ONE sort key
    // under which range predicates on EITHER column touch a bounded
    // band of files. The query materializes the 32-bit Morton code of
    // (doc_id, n_chars) (low 16 bits each) and PROVES the locality
    // contract: within any 14-bit z-prefix tile, each dimension's span
    // is < 2^9 (the 9 free interleaved bits) — the zone-map-pruning
    // guarantee, asserted per tile by integer compare. Map-only code
    // computation; the tile aggregate is bounded by tile cardinality.
    "q_zorder_layout" -> ((s, d) => {
      val a = col("doc_id") % 65536L
      val b = col("n_chars") % 65536L
      Tables.documents(s, d)
        .select(a.as("a"), b.as("b"), graft.ext.Layout.zorderCol(a, b).as("zval"))
        .withColumn("tile", shiftright(col("zval"), 18))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("a")).as("a_min"), max(col("a")).as("a_max"),
          min(col("b")).as("b_min"), max(col("b")).as("b_max"))
        .select(col("tile"), col("n"), col("a_min"), col("a_max"),
          col("b_min"), col("b_max"),
          (col("a_max") - col("a_min") < 512).as("a_bounded"),
          (col("b_max") - col("b_min") < 512).as("b_bounded"))
        .orderBy(col("tile"))
    }),

    // EXACT median/p90 without a global sort — the histogram method
    // (q_ks_drift in CurationQueries builds the same per-(source,
    // length) histogram + cumulative window with a grid fill — a
    // change to either derivation must visit both):
    // integer doc lengths aggregate to a per-(source, length) count
    // relation (bounded by distinct lengths, not corpus size), a
    // metadata-sized cumulative window walks it, and the k-th order
    // statistic is the first length whose cumulative count reaches
    // k = (n+1) div 2 (lower median) / (9n+9) div 10 (= ceil(0.9n)).
    // All integer — no quantile_cont interpolation to diverge on.
    "q_median_exact" -> ((s, d) => {
      val hist = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(w))
      val tot = hist.groupBy(col("source")).agg(sum(col("c")).as("n"))
      cum.join(broadcast(tot), Seq("source"))
        .groupBy(col("source"), col("n"))
        .agg(
          min(when(col("cum") >= expr("(n + 1) div 2"), col("n_chars")))
            .as("median"),
          min(when(col("cum") >= expr("(n * 9 + 9) div 10"), col("n_chars")))
            .as("p90"))
        .orderBy(col("source"))
    }),

    // Corpus snapshot diff — the ingest-versioning primitive: which
    // documents were added / removed / modified / unchanged between two
    // corpus versions. V2 is derived deterministically in-plan (every
    // 7th doc removed, every surviving 11th revised, a new shard per
    // 13th), so the oracle replays the same derivation. Scale shape:
    // only narrow (doc_id, md5) relations enter the one full-outer
    // hash join — text never shuffles; the status projection is
    // map-only.
    "q_corpus_diff" -> ((s, d) => {
      val base = Tables.documents(s, d)
      val v1 = base.select(col("doc_id"),
        md5(coalesce(col("text"), lit(""))).as("old_md5"))
      val v2kept = base.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 11 === 0,
              concat(coalesce(col("text"), lit("")), lit(" [rev2]")))
            .otherwise(coalesce(col("text"), lit("")))).as("new_md5"))
      val v2new = base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          md5(concat(lit("new shard "), col("doc_id").cast("string")))
            .as("new_md5"))
      v1.join(v2kept.unionByName(v2new), Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("old_md5"), col("new_md5"),
          when(col("old_md5").isNull, "added")
            .when(col("new_md5").isNull, "removed")
            .when(col("old_md5") =!= col("new_md5"), "modified")
            .otherwise("unchanged").as("status"))
        .orderBy(col("doc_id"))
    }),

    // ---- sketch cardinality (HLL++) ---------------------------------
    // The 100 TB "how many distinct X" answer: approx_count_distinct is
    // a fixed-size merge-able HLL++ sketch (exact countDistinct is a
    // full shuffle of the distinct set). Exact counts are hash-checked
    // against DuckDB; the sketch's answers are gated by the documented
    // error bound — rsd 0.05, asserted at 3σ (15%, integer compare;
    // measured ≤ 8% across sf0.001/0.01/0.1).
    "q_approx_distinct" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val t = toks.groupBy(col("source")).agg(
        countDistinct(col("tok")).as("n_tok_exact"),
        approx_count_distinct(col("tok"), 0.05).as("atok"))
      val i = docs.groupBy(col("source")).agg(
        countDistinct(col("doc_id")).as("n_id_exact"),
        approx_count_distinct(col("doc_id"), 0.05).as("aid"))
      t.join(i, "source").select(col("source"), col("n_tok_exact"), col("n_id_exact"),
          (abs(col("atok") - col("n_tok_exact")) * 100 <= col("n_tok_exact") * 15)
            .as("tok_sketch_ok"),
          (abs(col("aid") - col("n_id_exact")) * 100 <= col("n_id_exact") * 15)
            .as("id_sketch_ok"))
        .orderBy(col("source"))
    }),

    // ---- tf-idf term ranking (corpus indexing / relevance) ----------
    // Per-document top-3 terms by tf·idf. Shape: tf is the one big
    // shuffle (map-side combined on (doc, tok)); df is bounded by
    // vocabulary cardinality and BROADCAST back, as is the one-row
    // corpus count — document content never shuffles twice. Ranking
    // sorts on the ROUNDED score (then term) so the order never hinges
    // on a final-ulp disagreement between engines.
    "q_tfidf_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(dfreq), "tok").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log((col("n_docs") + lit(1)).cast("double") /
            (col("df") + lit(1)).cast("double")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // ---- as-of join (point-in-time lookup) --------------------------
    // for each click, the user's most recent purchase at-or-before it
    // (inclusive); union-tag + running window — ONE shuffle, no range
    // explosion (see AsofJoin scaladoc). The oracle is DuckDB's native
    // ASOF JOIN — an independent implementation of the same semantics.
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("pts"), col("value"))
      graft.ext.AsofJoin.asofJoin(clicks, purchases, "user_id", "ts",
          payload = Seq("pts", "value"), outPrefix = "prior_")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("tus"),
          expr("prior_pts div 1000").as("prior_tus"),
          col("prior_value"))
        .orderBy(col("user_id"), col("tus"), col("event_id"))
    }),

    // NEAREST direction: each click attaches the purchase minimizing
    // |Δt| (tie → the earlier one) — still ONE shuffle: both carries
    // are windows over the same key partitioning (Exchange reused,
    // PlanShapeSpec keeps watch). Oracle: DuckDB LATERAL argmin.
    "q_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("pts"), col("value"))
      graft.ext.AsofJoin.asofJoinNearest(clicks, purchases, "user_id", "ts",
          payload = Seq("pts", "value"), outPrefix = "near_")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("tus"),
          expr("near_pts div 1000").as("near_tus"),
          col("near_value"))
        .orderBy(col("user_id"), col("tus"), col("event_id"))
    }),

    // forward direction: each click attaches its NEXT purchase (the
    // attribution-window shape); oracle = DuckDB's native forward ASOF
    "q_asof_join_fwd" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("pts"), col("value"))
      graft.ext.AsofJoin.asofJoin(clicks, purchases, "user_id", "ts",
          payload = Seq("pts", "value"), outPrefix = "next_",
          direction = "forward")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("tus"),
          expr("next_pts div 1000").as("next_tus"),
          col("next_value"))
        .orderBy(col("user_id"), col("tus"), col("event_id"))
    }),

    // JL random projection 64 → 16 dims: md5-derived ±1 signs (the
    // oracle rebuilds the same matrix in SQL), fixed-point inputs so
    // the projection sums are exact integers — map-only, no shuffle
    "q_embed_project" -> ((s, d) => {
      graft.ext.Quantize.jlProject(Tables.embeddings(s, d),
          "vec_id", "embedding", dIn = 64, dOut = 16)
        .orderBy(col("vec_id"), col("k"))
    }),

    // ANN served from the PROJECTED store: top-1 search runs on the
    // 16-dim integer projections (×4 dot-product shrink). The raw
    // corpus's neighbors are noise-level (near-random unit vectors),
    // so the contract is on the planted near-dup corpus: ≥ 99% of
    // queries must rank their planted duplicate (cos ≈ 0.93 in 64d)
    // top-1 after projection — measured 100% at sf0.01, 99.9% at
    // sf0.1 (integer-compare aggregate, no float threshold)
    "q_knn_projected" -> ((s, d) => {
      val corpus = plantedNearDupCorpus(Tables.embeddings(s, d))
      val proj = graft.ext.Quantize.jlProjectVec(corpus,
        "vec_id", "embedding", dIn = 64, dOut = 16)
      val queries = proj.filter(col("vec_id") < 1000000L)
      val top1 = Similarity.bruteForceTopK(proj, "vec_id", "pvec", queries, k = 1)
      top1.agg(
          count(lit(1)).as("n_queries"),
          sum(when(col("nid") === col("qid") + 1000000L, 1L).otherwise(0L))
            .as("hits"))
        .select(col("n_queries"),
          (col("hits") * 100L >= col("n_queries") * 99L).as("jl_top1_ok"))
    }),

    // ---- skew-safe aggregation (oracle = the direct groupBy) --------
    "q_salted_agg" -> ((s, d) => {
      graft.ext.Skew.saltedAgg(Tables.events(s, d), "event_type",
          col("value").cast("decimal(18,2)"), saltBuckets = 16)
        // terminal decimal → double for engine-stable hashing (exact value)
        .withColumn("total", col("total").cast("double"))
        .orderBy(col("event_type"))
    }),

    // ---- skew-safe join (hot fact keys × small dim) -----------------
    // events has only 5 distinct event_types — every key is hot, the
    // adversarial case for a hash join. The salted form spreads each
    // key over 16 reducers and must reproduce the plain join exactly
    // (aggregated per dim attribute so the gate stays compact).
    "q_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("type_code", substring(md5(col("event_type")), 1, 8))
      graft.ext.Skew.saltedJoin(
          ev.select(col("event_type"), col("event_id"), col("value")),
          dim, "event_type", saltBuckets = 16)
        .groupBy(col("type_code"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("type_code"))
    }),

    // ---- AQE-repaired skewed join (runtime split, no salt) ----------
    // The token→document-frequency join is naturally skewed: stopword
    // tokens own a large share of the corpus, so their shuffle
    // partitions dwarf the median. The query declares the PLAIN
    // sort-merge join (merge-hinted — a vocab table at 100 TB is past
    // broadcast size) and leaves the repair to AQE's OptimizeSkewedJoin
    // at runtime; ScaleTechniquesSpec executes the same operator under
    // skew-scaled thresholds and asserts the finalized plan splits the
    // hot partitions (skew=true). Result is AQE-invariant — the oracle
    // evaluates the join directly.
    "q_skew_aqe_join" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val df = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      graft.ext.Skew.aqeJoin(toks, df, "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("df")).as("sum_df"))
        .orderBy(col("doc_id"))
    }),

    // Join-key skew DIAGNOSIS — the observability query you run before
    // choosing between broadcast, salting, and AQE skew-join: the
    // token-frequency histogram's head (top-10 hottest keys), each
    // key's share of all rows (floor-contract micro-units), and its
    // multiple of the mean key load. Aggregates bounded by vocabulary;
    // the head cut is TakeOrdered. The same relation drives
    // q_skew_aqe_join, so the report describes a real hot path.
    "q_skew_stats" -> ((s, d) => {
      val toks = graft.ext.TextStats
        .tokenRows(Tables.documents(s, d), "doc_id", "text").select(col("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = freq.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
      freq.crossJoin(broadcast(tot))
        .select(col("tok"), col("cnt"), col("n_keys"),
          (floor(col("cnt").cast("double") / col("total") * 1e6 + 0.5) / 1e6)
            .as("share"),
          (floor(col("cnt").cast("double") * col("n_keys") / col("total")
            * 1e2 + 0.5) / 1e2).as("x_mean"))
        .orderBy(col("cnt").desc, col("tok")).limit(10)
    }),

    // ---- bucketed range join (point-in-interval, equi-join plan) ----
    // clicks within 12 hours after each purchase, per user; the
    // bucket rewrite keeps the plan a hash join (RangeChunkBloomSpec
    // asserts no BroadcastNestedLoopJoin). Oracle = DuckDB's plain
    // inequality join — an independent evaluation of the predicate.
    "q_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // ts is long nanos (nanosAsLong) — convert to epoch micros
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), expr("ts div 1000").as("cus"),
          col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("lo"),
          (expr("ts div 1000") + RangeJoinWindowUs).as("hi"),
          col("event_id").as("purchase_id"))
      graft.ext.RangeJoin.pointInInterval(clicks, purchases, Seq("user_id"),
          "cus", "lo", "hi", bucketWidth = RangeJoinWindowUs)
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_clicks"), min(col("cus")).as("first_click_us"))
        .orderBy(col("purchase_id"))
    }),

    // ---- sliding-window chunking (training-sequence windows) --------
    // 64-token windows, 16-token overlap; map-only — no shuffle at any
    // corpus size; rows carry (id, idx, count, md5), never the text
    "q_chunk_docs" -> ((s, d) =>
      graft.ext.Chunking.slidingChunks(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // ---- chunk → pack composition (sequence prep end to end) --------
    // sliding windows feed token-budget bins per source: the full
    // training-sequence materialization path, still without the chunk
    // text ever entering a shuffle (only (ids, counts) move; the
    // writer re-slices text from the co-partitioned source)
    "q_chunk_pack" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val chunks = graft.ext.Chunking.slidingChunks(docs, "doc_id", "text",
          chunkSize = 64, overlap = 16)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      chunks
        .withColumn("cum", sum(col("chunk_tokens").cast("long")).over(w))
        .withColumn("bin", expr("(cum - chunk_tokens) div 512"))
        .select(col("doc_id"), col("chunk_idx"), col("source"),
          col("chunk_tokens"), col("bin"))
        .orderBy(col("source"), col("doc_id"), col("chunk_idx"))
    }),

    // ---- bloom membership screen (cross-corpus overlap) -------------
    // member set = texts of every 7th doc; candidates = the whole
    // corpus. The sketch's error is one-sided: the oracle pins exact
    // membership per row plus the no-false-negative invariant — a
    // missed member flips a boolean and fails the gate. (The exact fp
    // join here exists to CHECK the contract; production screens only
    // exact-join the survivors.)
    "q_bloom_screen" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("fp", xxhash64(col("text")))
      val members = docs.filter(col("doc_id") % 7 === 0).select(col("fp")).distinct()
      graft.ext.Bloom.screenByLongKey(docs, members, "fp") // sized from members.count()
        .join(members.withColumn("__m", lit(true)), Seq("fp"), "left")
        .select(col("doc_id"), col("__m").isNotNull.as("is_member"),
          (col("bloom_hit") || col("__m").isNull).as("no_false_negative"))
        .orderBy(col("doc_id"))
    }),

    // ---- int8 embedding quantization (×4 store shrink) --------------
    // integer-exact gate: positional checksum + L1 norm of the
    // quantized vector (half-up floor — identical bits cross-engine),
    // plus the reconstruction-cosine contract the quantizer must meet
    "q_embed_quantize" -> ((s, d) => {
      val q = graft.ext.Quantize.int8(Tables.embeddings(s, d), "embedding")
      val weighted = transform(col("qvec"),
        (qi, i) => qi.cast("long") * (i.cast("long") + 1L))
      val l1terms = transform(col("qvec"), qi => abs(qi).cast("long"))
      def asum(arr: org.apache.spark.sql.Column) =
        aggregate(arr, lit(0L), (acc, x) => acc + x)
      q.select(col("vec_id"),
          asum(weighted).as("checksum"),
          asum(l1terms).as("l1"),
          (graft.ext.Quantize.reconCosine("embedding", "qvec") >= 0.99)
            .as("recon_ok"))
        .orderBy(col("vec_id"))
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

    // ---- multimodal (real javax.imageio codec path) -----------------
    // frame sampling: every 2nd 32-byte frame of the payload
    "q_multimodal_frames" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
      Multimodal.frameSample(withBin, "doc_id", "payload", frameSize = 32, every = 2)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("frame_bytes"),
          md5(col("frame")).as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL codec decode: each doc carries a genuine PNG/BMP/TIFF payload
    // (javax.imageio) whose dims/pixels/container are planted
    // closed-form in doc_id; the query runs the actual ImageIO
    // auto-detect + raster decode and emits what it FOUND. The oracle
    // predicts every value analytically — it can only match if a real
    // encode→decode round trip preserved the planted raster.
    "q_multimodal_decode" -> ((s, d) => {
      // the small corpus parquet scans as ONE partition — repartition
      // the narrow id column to cluster width BEFORE the codec map so
      // encode/decode work spreads across every core (8-byte rows
      // shuffle; payloads are generated and decoded in place, same
      // width-matching as the brute-force ANN corpus side)
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      Multimodal.decodeMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // REAL resize: decode the PNG/BMP/TIFF payload, nearest-neighbor
    // resample the decoded raster to 8×8, checksum the OUTPUT pixels
    // (positional + plain sums — integer-exact, no rounding hazard);
    // map-only, the payload never shuffles
    "q_multimodal_resize" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      Multimodal.resizeChecksum(withBin, "doc_id", "payload", tw = 8, th = 8)
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // EXIF-orientation-aware resize — the round-8 pieces composed: the
    // JPEG APP1/TIFF metadata walk (q_extract_media_metadata's parser)
    // reads a planted Orientation (ALL EIGHT spec values cycling in
    // doc_id — rotations 1/3/6/8 AND mirrored 2/4/5/7) from a genuine
    // EXIF sidecar, the decoded raster is made upright, THEN
    // resampled to 8×8 — what every real image pipeline must do
    // before training. The oracle mirrors each remap analytically
    // (every orientation is a closed-form index map of the planted
    // pattern), so a skipped, wrong-handed, or un-mirrored transform
    // cannot pass.
    "q_multimodal_resize_oriented" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
        .withColumn("exif", Multimodal.syntheticExifCol(col("doc_id")))
      Multimodal.resizeOrientedChecksum(withBin, "doc_id", "payload", "exif",
          tw = 8, th = 8)
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // REAL audio decode — the second genuine modality beside images:
    // each doc carries a real RIFF/WAVE container (javax.sound.sampled)
    // whose 16-bit PCM samples are planted closed-form in doc_id; the
    // query runs the actual AudioSystem SPI chain (sniff, header,
    // frame stream) and emits what it DECODED. The oracle predicts
    // frame count, rate, channels, sample sum, and the positional
    // checksum analytically — matching requires a byte-true
    // encode→decode round trip (sign-extension or endianness slips
    // flip the signed sums).
    "q_audio_decode" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticWavCol(col("doc_id")))
      Multimodal.decodeAudioMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Perceptual image fingerprint (dHash): decode the real container,
    // 9×8 nearest-neighbor resample, one bit per horizontal gradient —
    // the image-side analogue of SimHash for near-dup dedup. The
    // oracle rebuilds every bit analytically from the planted pixel
    // algebra (closed-form resample indices + gray values), so a
    // wrong resample convention, a channel swap, or a sign slip flips
    // bits and fails the hash. Map-only; hex output keeps Long sign
    // out of the cross-engine compare.
    "q_image_dhash" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      Multimodal.imageDhash(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Perceptual image NEAR-DUP pairs: every document's image is
    // re-encoded into a different lossless container (png↔bmp) under a
    // shifted id — the byte-level-distinct, pixel-identical duplicate
    // class exact hashing misses — and pairs are recovered by dHash
    // equality. The join key is the 8-byte fingerprint, so the shuffle
    // moves (id, hash) rows only, never payloads; hamming-k
    // generalization is the SimHash pigeonhole banding. The oracle
    // derives every hash analytically (copies share their original's
    // planted raster), so chance structural collisions appear
    // identically on both sides.
    "q_image_neardup" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      val copies = base.select((col("doc_id") + 1000000L).as("doc_id"),
        Multimodal.reencodeCol(col("payload")).as("payload"))
      val hashed = Multimodal.imageDhash(base.unionByName(copies),
          "doc_id", "payload")
        .toDF().filter(col("dhash_hex") =!= "")
      hashed.as("a").join(hashed.as("b"),
          col("a.dhash_hex") === col("b.dhash_hex") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .orderBy(col("i"), col("j"))
    }),

    // The image-side curation funnel in one plan: single-decode
    // profile pass (dims + fingerprint fused — decoding twice is the
    // waste a 100 TB pass can't afford) → validity gate → minimum-size
    // gate → perceptual keep-first dedup. Only (id, dims, 8-byte hash)
    // rows reach the dedup window; payloads never shuffle.
    "q_image_funnel" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticImageCol(col("doc_id")))
      val profiled = Multimodal.imageProfile(base, "doc_id", "payload").toDF()
      val gated = profiled
        .filter(col("width") > 0 && col("width") * col("height") >= 300)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dhash_hex")).orderBy(col("doc_id"))
      gated.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("width"), col("height"), col("dhash_hex"))
        .orderBy(col("doc_id"))
    }),

    // MP4 container metadata — the third modality family: each doc
    // carries a real ISO BMFF box tree (ftyp + moov/mvhd/trak/tkhd/
    // mdia/stbl/stsd — MPEG-4 Part 12, public spec) with planted
    // duration, track layout, codec fourccs, and 16.16 track dims;
    // the query walks the actual boxes (recursion, size fields,
    // version-dependent offsets). Frame DECODE is impossible without
    // codec libraries — container structure IS the
    // ExtractMediaMetadata role for video (reference tika.xml:1761).
    // Map-only; the payload never shuffles.
    "q_video_meta" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticMp4Col(col("doc_id")))
      Multimodal.videoMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Audio perceptual fingerprint — the third leg of the perceptual
    // family (text SimHash, image dHash): 32 energy-gradient bits over
    // the REAL decoded PCM, window energies as exact integer Σ s².
    // The oracle rebuilds every bit from the planted sample algebra —
    // sign-extension, endianness, or window-boundary slips flip bits.
    "q_audio_fingerprint" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id")) // codec work needs cluster width, as above
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("payload", Multimodal.syntheticWavCol(col("doc_id")))
      Multimodal.audioFingerprint(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // ---- deterministic sampling (reproducible across engines) -------
    // per-stratum keep-rates, map-only filter — no shuffle at any scale
    "q_sample_stratified" -> ((s, d) => {
      graft.ext.Sampling.stratifiedSample(Tables.documents(s, d),
          "doc_id", "source", SampleRates, defaultRate = 0.125)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    // exactly-k-per-stratum via smallest-hash rank, with the 0.5
    // over-sampling pre-filter that makes the shape scale (see
    // Sampling scaladoc); the oracle applies the identical pre-filter
    "q_sample_per_source" -> ((s, d) => {
      graft.ext.Sampling.topKPerStratum(Tables.documents(s, d),
          "doc_id", "source", k = 5, prefilterRate = 0.5)
        .select(col("doc_id"), col("source"), col("rank"))
        .orderBy(col("source"), col("rank"))
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
      val toks = split(col("text"), " ")
      val bidx = when(size(toks) >= 2, sequence(lit(1), size(toks) - 1))
        .otherwise(array().cast("array<int>"))
      val bigr = Tables.documents(s, d).select(col("doc_id"),
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

    // deterministic train/val/test assignment: disjoint md5-selector
    // ranges (80/10/10) — every engine, run, and partitioning assigns
    // each document to the same split; map-only, no shuffle, and
    // adding documents never reassigns existing ones
    "q_split_assign" -> ((s, d) => {
      val sel = graft.ext.Sampling.selector(col("doc_id"))
      Tables.documents(s, d).select(col("doc_id"),
          when(sel < lit(graft.ext.Sampling.thresholdHex(0.8)), "train")
            .when(sel < lit(graft.ext.Sampling.thresholdHex(0.9)), "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    }),

    // data-mixture sampling: per-source keep-rates computed IN-PLAN so
    // every source contributes equal expected tokens, then the same
    // map-only hash-threshold filter; rates broadcast back — the
    // corpus never shuffles
    "q_mix_sources" -> ((s, d) => {
      graft.ext.Sampling.tokenBalancedSample(Tables.documents(s, d),
          "doc_id", "source", "text")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // temperature-weighted mixture PLAN (α = 0.5): the per-source
    // weights/rates a multilingual pipeline samples by — √n mass
    // reweighting inside a quarter-token budget, small sources keep
    // proportionally more of themselves. The whole plan is
    // integer/decimal/sqrt algebra under the floor-rounding
    // discipline, so it is hash-exact cross-engine (α is fixed at 0.5
    // because sqrt is correctly-rounded IEEE and pow is not).
    "q_source_mixture" -> ((s, d) => {
      graft.ext.Sampling.temperatureMixture(Tables.documents(s, d),
          "source", "text", budgetDen = 4)
        .orderBy(col("source"))
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
    // REAL gzip ingestion: each doc's text round-trips through the
    // JDK zlib codec (deflate on generation, GZIPInputStream header
    // parse + inflate + CRC32/ISIZE verification on decode); every
    // 97th member has one byte flipped mid-stream and must land on
    // the error route (ok=false), never crash. The oracle hashes the
    // ORIGINAL text — only a genuine round trip matches. Map-only:
    // the payload never shuffles (at scale, file-source parallelism
    // provides the codec width; no repartition needed or wanted)
    "q_gzip_ingest" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("payload",
          graft.ext.Compressed.gzipPlantedCol(col("text"), col("doc_id"), 97))
      graft.ext.Compressed.gunzipMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
    }),
    // WARC-shard shape: each doc's text split into 3 equal character
    // slices, each slice a gzip member, members concatenated into one
    // binary stream (exactly how .warc.gz packs records). Every 101st
    // doc's SECOND member has its CRC trailer flipped — the decoder
    // must error THAT member while still decoding members 0 and 2
    // (record-level degradation; whole-stream loss would fail the
    // oracle). 1→N narrow flatMap, no shuffle on the payload
    "q_gzip_members" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("payload",
          graft.ext.Compressed.gzipMembersPlantedCol(
            col("text"), col("doc_id"), 3, 101))
      graft.ext.Compressed.memberMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"), col("member_idx"))
    }),
    // ZIP shard ingestion: the walker parses LOCAL HEADERS directly
    // (APPNOTE.TXT) instead of ZipInputStream, because the JDK stream
    // aborts the archive at the first damaged member while the
    // header's csize lets us CRC-verify each member ourselves, emit
    // the error contract for that one, and resync at the next header.
    // Every 101st doc's member 1 has a byte flipped inside its deflate
    // data — that member fails, its neighbors survive. Map-only 1→N.
    "q_zip_members" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("payload",
          graft.ext.Zip.zipPlantedCol(col("text"), col("doc_id"), 3, 101))
      graft.ext.Zip.memberMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"), col("member_idx"))
    }),

    // TAR shard ingestion (UnpackContent role): each doc packed as a
    // 3-member ustar archive (same slice algebra as the gzip oracle),
    // split back by a real header walk — octal fields, checksum
    // verification, prefix join, zero-block termination. Every 101st
    // doc's member 1 carries a damaged checksum digit: the walker must
    // emit the error contract for THAT member and resync past it on
    // the declared size (per-member isolation, not whole-stream loss).
    // Map-only 1→N; the archive bytes never shuffle.
    "q_tar_members" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("payload",
          graft.ext.Tar.tarPlantedCol(col("text"), col("doc_id"), 3, 101))
      graft.ext.Tar.memberMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"), col("member_idx"))
    }),
    // URL parsing over a planted URL (deterministic in source/lang/
    // doc_id): host via Spark's native parse_url, registered domain,
    // path depth, query detection — all column algebra, map-only. The
    // oracle predicts every field analytically from the construction,
    // so only a correct parse of the built string matches
    "q_url_parse" -> ((s, d) =>
      graft.ext.Urls.urlParse(Tables.documents(s, d))
        .orderBy(col("doc_id"))),
    // Domain cap (the C4/RefinedWeb anti-spam policy): keep ≤3 docs
    // per registered domain by n_chars DESC (doc_id tie-break), with
    // the domain's total count alongside. One shuffle on the domain
    "q_domain_cap" -> ((s, d) =>
      graft.ext.Urls.domainCap(Tables.documents(s, d), 3)
        .orderBy(col("domain"), col("doc_id"))),
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
      val segs = graft.ext.Boilerplate.segmentArray(col("text"), segTokens = 6)
      Tables.documents(s, d)
        .withColumn("psegs",
          when(size(segs) >= 2, concat(segs, slice(segs, 1, 2)))
            .otherwise(segs))
        .select(col("doc_id"),
          concat_ws(" ", graft.ext.Boilerplate.keepFirstDistinct(col("psegs")))
            .as("clean_text"),
          size(col("psegs")).as("n_segs"),
          size(graft.ext.Boilerplate.keepFirstDistinct(col("psegs")))
            .as("kept_segs"))
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
    // deterministic training-order shuffle: every doc gets a
    // reproducible pseudorandom (shard, pos) address; one bounded
    // window per shard, content never enters the sort
    "q_shuffle_order" -> ((s, d) => {
      graft.ext.Sampling.shuffleOrder(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    }),
    // vocabulary building (BPE-precursor token counts): partial agg +
    // one shuffle bounded by vocabulary cardinality, deterministic
    // truncation (count desc, token asc)
    "q_vocab_topn" -> ((s, d) => {
      graft.ext.Sampling.vocab(Tables.documents(s, d), "text")
        .orderBy(col("cnt").desc, col("tok"))
        .limit(20)
    }),
    // sequence packing: per-source token-budget bins via a running-sum
    // window — strata pack independently (no global order), content
    // never enters the window
    "q_pack_sequences" -> ((s, d) => {
      graft.ext.Packing.packByStratum(Tables.documents(s, d),
          "doc_id", "source", "text", budget = 500)
        .orderBy(col("source"), col("doc_id"))
    }),
    // within-doc repetition signals (the Gopher-style quality rule):
    // token and trigram duplication counts, pure column algebra —
    // map-only, integer outputs so the gate can't hinge on rounding
    "q_repetition" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val idx = when(size(toks) >= 3, sequence(lit(1), size(toks) - 2))
        .otherwise(array().cast("array<int>"))
      val tris = transform(idx, i => concat_ws(" ", slice(toks, i, lit(3))))
      Tables.documents(s, d).select(
          col("doc_id"),
          size(toks).as("n_tok"),
          size(array_distinct(toks)).as("n_tok_uniq"),
          size(tris).as("n_tri"),
          size(array_distinct(tris)).as("n_tri_uniq"))
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
    // per-source corpus statistics (curation reporting): one groupBy
    // shuffle; EXACT percentile is a per-group buffering aggregate, so
    // this form is for bounded group sizes (reports, samples) — at
    // 100 TB swap percentile→approx_percentile (sketch, fixed memory).
    // Quartiles on integer inputs interpolate on exact binary fractions
    // (.25/.5/.75), so Spark and DuckDB agree bit-for-bit.
    "q_corpus_stats" -> ((s, d) => {
      Tables.documents(s, d).groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("n_chars")).as("total_chars"),
          percentile(col("n_chars"), lit(0.25)).as("q1_chars"),
          percentile(col("n_chars"), lit(0.5)).as("median_chars"),
          percentile(col("n_chars"), lit(0.75)).as("q3_chars"))
        .orderBy(col("source"))
    }),
    // the SKETCH path of corpus stats — what q_corpus_stats' scaladoc
    // prescribes at 100 TB: approx_percentile is a fixed-memory,
    // merge-able KLL-style sketch (no per-group buffering), so it
    // scales where exact percentile cannot. Its value is engine-
    // specific, but its accuracy bound is not: with accuracy 100 the
    // returned element's rank is within n/100 of the target, which the
    // plan itself verifies by re-ranking the sketch's answer against
    // the group (n_lt ≤ 0.51n and n_le ≥ 0.49n, integer compares) —
    // the oracle asserts the bound holds for every source.
    "q_corpus_stats_approx" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val appx = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        percentile_approx(col("n_chars"), lit(0.5), lit(100)).as("am"))
      val ranks = docs.join(appx.select(col("source"), col("am")), "source")
        .groupBy(col("source"))
        .agg(sum(when(col("n_chars") < col("am"), 1).otherwise(0)).as("n_lt"),
             sum(when(col("n_chars") <= col("am"), 1).otherwise(0)).as("n_le"))
      appx.join(ranks, "source").select(
          col("source"), col("n_docs"),
          (col("n_lt") * 100 <= col("n_docs") * 51 &&
            col("n_le") * 100 >= col("n_docs") * 49).as("median_rank_ok"))
        .orderBy(col("source"))
    }),
    // the end-to-end curation funnel: language gate → quality gate →
    // exact dedup → deterministic 50% sample, composed in ONE Catalyst
    // plan — both filters fuse into the scan stage, the dedup window is
    // the only shuffle, and the sample filter is map-only on its output
    "q_curation_funnel" -> ((s, d) => {
      val scored = Tables.documents(s, d).select(
        col("doc_id"), col("text"), col("source"),
        TextStats.langIdCol(col("text")).as("lang_pred"),
        TextStats.qualityCol(col("text")).as("quality"))
      val gated = scored.filter(col("lang_pred") === "en" && col("quality") >= 0.5)
      graft.ext.Sampling.sample(
          Dedup.exactKeepFirst(gated, "doc_id", "text"), "doc_id", 0.5)
        .select(col("doc_id"), col("source"), col("quality"))
        .orderBy(col("doc_id"))
    }),
    // train/test contamination screen: src0 plays the benchmark suite,
    // the rest of the corpus is the training candidate set; benchmark
    // n-grams broadcast — no shuffle of candidate content
    "q_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ext.Contamination.screen(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 3, threshPct = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // NEAR-duplicate decontamination: training docs whose 3-gram
    // Jaccard against ANY benchmark doc reaches 0.8 — catches the
    // paraphrased/lightly-edited leakage the exact n-gram screen
    // misses. Banded MinHash on both corpora, candidates only from
    // cross (band,key) collisions, exact-Jaccard verify; the oracle is
    // the full cross-pair exact-Jaccard join (all-pairs form DuckDB
    // can afford at oracle scale; the engine never materializes it)
    "q_decontaminate_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val benchSrc = Seq("src0", "src1", "src2", "src3", "src4")
      graft.ext.Dedup.minhashCrossNearDups(
          docs.filter(!col("source").isInCollection(benchSrc)),
          docs.filter(col("source").isInCollection(benchSrc)),
          "doc_id", "text", n = 3, minJ = 0.8)
        .select(col("i").as("doc_id"), col("j").as("bench_id"), col("jaccard"))
        .orderBy(col("doc_id"), col("bench_id"))
    }),

    // decontamination by EXCISION: shared 3-gram spans are cut from
    // the candidate text instead of dropping whole documents; bench
    // grams broadcast, only (id, positions) shuffle, text never does
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ext.Contamination.excise(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // curation funnel v2 — the ROUND-7 operators composed in one plan:
    // canonical-form dedup (normalize → keep-first) → cross-document
    // boilerplate removal → an integer-compare retention gate (keep
    // docs retaining ≥ half their segments) → deterministic
    // training-order shuffle. Every stage is individually
    // oracle-verified; this query proves they COMPOSE (clean_text is
    // computed but unused, so Catalyst prunes the reassembly concat
    // out of the final plan).
    "q_curation_funnel2" -> ((s, d) => {
      val canon = Tables.documents(s, d)
        .withColumn("norm", TextStats.normalizeCol(col("text")))
      val deduped = Dedup.exactKeepFirst(canon, "doc_id", "norm")
        .select(col("doc_id"), col("norm"))
      val cleaned = graft.ext.Boilerplate.dropRepeatedSegments(
        deduped, "doc_id", "norm", segTokens = 8, maxDf = 2)
      val gated = cleaned
        .filter(col("kept_segs") > 0 && col("kept_segs") * 2 >= col("total_segs"))
        .select(col("id").as("doc_id"), col("kept_segs"), col("total_segs"))
      graft.ext.Sampling.shuffleOrder(gated, "doc_id")
        .select(col("doc_id"), col("shard"), col("pos"),
          col("kept_segs"), col("total_segs"))
        .orderBy(col("shard"), col("pos"))
    }),

    // BPE training round-1 statistics: adjacent character-pair counts
    // weighted by word frequency over the whole corpus — the subword
    // tokenizer trainer's inner-loop aggregation (Sennrich '16). The
    // corpus collapses to the distinct-word relation in one pass; the
    // pair shuffle is bounded by distinct-pair cardinality (≤ |Σ|²),
    // never corpus size. Top-20 with count-desc/pair-asc tie-break =
    // the first merge candidates a tokenizer would consider.
    "q_bpe_merges" -> ((s, d) => {
      graft.ext.Bpe.pairCounts(Tables.documents(s, d), "text")
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    }),

    // BPE applied at a REALISTIC merge budget: train 256 merges (k
    // driver-held model rows, like the IVF centroids — the corpus
    // vocabulary exhausts partway, which both engines treat as no-op
    // rounds), tokenize each DISTINCT word once (map-only, merges in
    // the closure), fan back to documents through the word join —
    // per-doc subword token counts, the number every packing/budget
    // decision downstream consumes. The GENERATED oracle replays all
    // 256 training rounds AND the greedy merge application in SQL over
    // a bracketed ⟨STX⟩sym⟨ETX⟩ representation (each symbol carries
    // its own delimiter pair, so literal left-to-right replace is
    // exactly the trainer's merge-skip-2 scan, including `a a a a` →
    // `aa aa`); its w-CTEs are MATERIALIZED — each is referenced twice
    // (next round's pair counts + next round's rewrite), and DuckDB
    // would otherwise inline them into a 2^k plan (measured: k=64
    // never finishes inlined, 48 s materialized at k=256/sf0.01).
    "q_bpe_encode" -> ((s, d) =>
      graft.ext.Bpe.encode(Tables.documents(s, d), "doc_id", "text", 256)
        .orderBy(col("doc_id"))),

    // Content-defined chunking (LBFS '01 / FastCDC): boundaries where
    // the 8-byte window's polynomial hash satisfies h % 64 == 0, so an
    // edit reshapes only the chunk it lands in and every later chunk
    // keeps its md5 identity — the property chunk-level dedup needs to
    // survive drift, which fixed windows (q_chunk_docs) cannot give.
    // One codegen'd boundary pass + column algebra; narrow, no shuffle.
    // The oracle replays every window hash in SQL (exact small-field
    // integer math, products ≤ 2^41 — no overflow on either engine).
    "q_chunk_cdc" -> ((s, d) =>
      graft.ext.Chunking.cdcChunks(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Tukey IQR outlier gate per source (the document-length screen a
    // corpus profile report feeds): flag docs outside
    // [q1 − 1.5·IQR, q3 + 1.5·IQR]. Quartiles of INTEGER n_chars
    // interpolate at exact quarters, so 4·q is an exact integer and
    // the gate reduces to pure integer compares (4n < 10·q1 − 6·q3,
    // 4n > 10·q3 − 6·q1) — no float boundary can flip cross-engine.
    // The 20-row per-source stats broadcast back; corpus stays narrow.
    "q_outlier_iqr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stats = docs.groupBy(col("source")).agg(
        (percentile(col("n_chars"), lit(0.25)) * 4).cast("long").as("q1x4"),
        (percentile(col("n_chars"), lit(0.75)) * 4).cast("long").as("q3x4"))
      docs.join(broadcast(stats), "source")
        .select(col("doc_id"), col("source"), col("n_chars"),
          (col("n_chars") * 4 < col("q1x4") * 10 - col("q3x4") * 6 ||
           col("n_chars") * 4 > col("q3x4") * 10 - col("q1x4") * 6)
            .as("is_outlier"))
        .orderBy(col("doc_id"))
    }),

    // JSONL ingestion with malformed-line isolation — the dominant
    // corpus interchange format, read through Spark's native JSON
    // source in PERMISSIVE mode: every 101st line is truncated
    // mid-record, the parser routes it to the corrupt-record column
    // instead of failing the file, and the doc_id is SALVAGED from the
    // raw line by regexp (the triage pattern an ingest pipeline
    // actually runs). Clean rows must round-trip text byte-exactly
    // through JSON escaping (md5-pinned). Scratch shard written by
    // Spark itself (no driver materialization).
    "q_jsonl_ingest" -> ((s, d) => {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_jsonl_${Integer.toHexString(d.hashCode)}")
      def deleteRec(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
        f.delete(); ()
      }
      deleteRec(p.toFile)
      Tables.documents(s, d)
        .select(col("doc_id"),
          to_json(struct(col("doc_id"),
            coalesce(col("text"), lit("")).as("text"))).as("l"))
        .select(when(col("doc_id") % 101 === 0,
            col("l").substr(lit(1), length(col("l")) - 2)) // mid-record cut
          .otherwise(col("l")).as("value"))
        .coalesce(1).write.mode("overwrite").text(p.toString)
      val parsed = s.read
        .schema("doc_id LONG, text STRING, _bad STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(p.toString)
      parsed.select(
          coalesce(col("doc_id"),
            regexp_extract(col("_bad"), "\"doc_id\":([0-9]+)", 1).cast("long"))
            .as("doc_id"),
          col("_bad").isNull.as("ok"),
          when(col("_bad").isNull, md5(col("text"))).otherwise(lit(""))
            .as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // CSV shard ingest with corrupt-row salvage — the jsonl pattern's
    // sibling for the other ubiquitous text interchange format. Clean
    // rows round-trip through Spark's OWN csv writer (quoting/escaping
    // conventions exercised for real: every 11th doc gets literal
    // quotes planted in its text); two corruption classes are written
    // as raw lines alongside — a mangled non-numeric id (every 101st)
    // and a missing text field (every 97th). PERMISSIVE + corrupt-
    // record column isolates each to its own row; the mangled id is
    // salvaged from the raw line by regexp, the missing-field row
    // keeps its parsed id. Probed semantics: non-numeric id → doc_id
    // NULL + _bad set; token underflow → text NULL + _bad set.
    "q_csv_ingest" -> ((s, d) => {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_csv_${Integer.toHexString(d.hashCode)}")
      def deleteRec(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
        f.delete(); ()
      }
      deleteRec(p.toFile)
      val aug = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          concat(coalesce(col("text"), lit("")), lit(" quoted \"part\" end")))
          .otherwise(coalesce(col("text"), lit(""))).as("text"))
      val badIds = col("doc_id") % 101 === 0
      val shortIds = col("doc_id") % 97 === 0 && !badIds
      aug.filter(!badIds && !shortIds)
        .coalesce(1).write.mode("overwrite").csv(s"$p/clean")
      aug.filter(badIds || shortIds)
        .select(when(badIds, concat(lit("x"), col("doc_id"), lit(",corrupt")))
          .otherwise(col("doc_id").cast("string")).as("value"))
        .coalesce(1).write.mode("overwrite").text(s"$p/bad")
      val parsed = s.read
        .schema("doc_id LONG, text STRING, _bad STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(s"$p/clean", s"$p/bad")
      parsed.select(
          coalesce(col("doc_id"),
            regexp_extract(col("_bad"), "^x([0-9]+),", 1).cast("long"))
            .as("doc_id"),
          col("_bad").isNull.as("ok"),
          when(col("_bad").isNull, md5(col("text"))).otherwise(lit(""))
            .as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // Curriculum ordering (easy→hard training schedule): stage from
    // ABSOLUTE quality-score deciles (map-only — no global sort or
    // ntile, which would funnel the corpus through one partition at
    // scale), deterministic md5 order within each stage (one
    // stage-partitioned window, the shuffleOrder shape). Stage and
    // position are reproducible under corpus growth: adding documents
    // never moves an existing doc's stage, only its neighbors' pos.
    "q_curriculum_order" -> ((s, d) => {
      val stage = floor(TextStats.qualityCol(col("text")) * 10).cast("int")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("stage"))
        .orderBy(col("__sel"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), stage.as("stage"),
          graft.ext.Sampling.selector(col("doc_id")).as("__sel"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("stage"), col("pos"))
        .orderBy(col("stage"), col("pos"))
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

    // The ingestion-HYGIENE funnel: the round's cleanup operators
    // composed in ONE plan — mojibake repair → NFC composition →
    // accent-fold + case/punctuation normalize as the DEDUP KEY →
    // keep-first — while the OUTPUT keeps the repaired, composed text
    // (so the oracle pins fix+NFC byte-for-byte, not just the key).
    // Every third doc carries planted mojibake, the rest a decomposed
    // sequence; dedup is accent-/case-insensitive (résumé == resume).
    // One shuffle total (the keep-first window); everything upstream
    // is map-only codegen.
    "q_hygiene_funnel" -> ((s, d) => {
      val raw = concat(substring(col("text"), 1, 80),
        when(col("doc_id") % 3 === 0, lit(" caf\u00C3\u00A9"))
          .otherwise(lit(" e\u0301nd ok")))
      val clean = graft.functions.UnicodeNormalize.nfc(
        graft.functions.FixMojibake.fix_mojibake(raw))
      val key = TextStats.normalizeCol(
        graft.functions.UnicodeNormalize.asciiFold(clean))
      val staged = Tables.documents(s, d)
        .select(col("doc_id"), clean.as("clean_text"), key.as("__k"))
      Dedup.exactKeepFirst(staged, "doc_id", "__k")
        .select(col("doc_id"), col("clean_text"))
        .orderBy(col("doc_id"))
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

    // curation funnel v3 — the full leakage-hygiene pipeline in ONE
    // plan: normalize → canonical dedup → quality gate (map-only,
    // fuses into the scan) → exact 3-gram contamination screen (bench
    // grams broadcast) → MinHash near-dup decontamination (band
    // collisions only — catches the paraphrased leakage the exact
    // screen misses) → cross-document boilerplate retention gate →
    // deterministic training-order shuffle. The text column moves
    // through exactly ONE shuffle (the dedup window); every
    // decontamination stage exchanges compact hashed/id relations
    // only — asserted by PlanShapeSpec (no cross join, no text
    // exchange beyond the dedup).
    "q_curation_funnel3" -> ((s, d) => {
      val benchSrc = Seq("src0", "src1", "src2", "src3", "src4")
      val norm = Tables.documents(s, d)
        .withColumn("norm", TextStats.normalizeCol(col("text")))
      val bench = norm.filter(col("source").isInCollection(benchSrc))
        .select(col("doc_id"), col("norm"))
      val train = norm.filter(!col("source").isInCollection(benchSrc))
        .select(col("doc_id"), col("norm"))
      val deduped = Dedup.exactKeepFirst(train, "doc_id", "norm")
        .select(col("doc_id"), col("norm"))
      val gatedQ = deduped.filter(TextStats.qualityCol(col("norm")) >= 0.5)
      val flagged = graft.ext.Contamination.screen(
          gatedQ, bench, "doc_id", "norm", n = 3, threshPct = 10)
        .filter(col("contaminated"))
        .select(col("id").as("doc_id"))
      val screened = gatedQ.join(flagged, Seq("doc_id"), "left_anti")
      val nearDup = Dedup.minhashCrossNearDups(
          screened, bench, "doc_id", "norm", n = 3, minJ = 0.8)
        .select(col("i").as("doc_id")).distinct()
      val decon = screened.join(nearDup, Seq("doc_id"), "left_anti")
      val cleaned = graft.ext.Boilerplate.dropRepeatedSegments(
        decon, "doc_id", "norm", segTokens = 8, maxDf = 2)
      val gated = cleaned
        .filter(col("kept_segs") > 0 && col("kept_segs") * 2 >= col("total_segs"))
        .select(col("id").as("doc_id"), col("kept_segs"), col("total_segs"))
      graft.ext.Sampling.shuffleOrder(gated, "doc_id")
        .select(col("doc_id"), col("shard"), col("pos"),
          col("kept_segs"), col("total_segs"))
        .orderBy(col("shard"), col("pos"))
    }),

    // Curation provenance — the funnel INVERTED: for every training
    // document, WHICH stage dropped it (dup / quality / contaminated /
    // neardup / boilerplate) or 'kept'. The ops question a curation
    // report answers ("where did my corpus go?") that the survivors-
    // only funnel can't. Recomputes the same stage relations as
    // q_curation_funnel3 and resolves the FIRST failing stage through
    // narrow id-relation joins; the oracle shares the funnel3 staged
    // CTEs verbatim (funnel3StagesCte) with a verdict finale.
    "q_funnel_provenance" -> ((s, d) => {
      val benchSrc = Seq("src0", "src1", "src2", "src3", "src4")
      val norm = Tables.documents(s, d)
        .withColumn("norm", TextStats.normalizeCol(col("text")))
      val bench = norm.filter(col("source").isInCollection(benchSrc))
        .select(col("doc_id"), col("norm"))
      val train = norm.filter(!col("source").isInCollection(benchSrc))
        .select(col("doc_id"), col("norm"))
      val deduped = Dedup.exactKeepFirst(train, "doc_id", "norm")
        .select(col("doc_id"), col("norm"))
      val gatedQ = deduped.filter(TextStats.qualityCol(col("norm")) >= 0.5)
      val flagged = graft.ext.Contamination.screen(
          gatedQ, bench, "doc_id", "norm", n = 3, threshPct = 10)
        .filter(col("contaminated"))
        .select(col("id").as("doc_id"))
      val screened = gatedQ.join(flagged, Seq("doc_id"), "left_anti")
      val nearDup = Dedup.minhashCrossNearDups(
          screened, bench, "doc_id", "norm", n = 3, minJ = 0.8)
        .select(col("i").as("doc_id")).distinct()
      val decon = screened.join(nearDup, Seq("doc_id"), "left_anti")
      val kept = graft.ext.Boilerplate.dropRepeatedSegments(
          decon, "doc_id", "norm", segTokens = 8, maxDf = 2)
        .filter(col("kept_segs") > 0 && col("kept_segs") * 2 >= col("total_segs"))
        .select(col("id").as("doc_id"))
      train.select(col("doc_id"))
        .join(deduped.select(col("doc_id"), lit(1).as("in_dd")),
          Seq("doc_id"), "left")
        .join(gatedQ.select(col("doc_id"), lit(1).as("in_qg")),
          Seq("doc_id"), "left")
        .join(flagged.select(col("doc_id"), lit(1).as("in_scr")),
          Seq("doc_id"), "left")
        .join(nearDup.select(col("doc_id"), lit(1).as("in_nd")),
          Seq("doc_id"), "left")
        .join(kept.select(col("doc_id"), lit(1).as("in_g3")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("in_dd").isNull, "dup")
            .when(col("in_qg").isNull, "quality")
            .when(col("in_scr").isNotNull, "contaminated")
            .when(col("in_nd").isNotNull, "neardup")
            .when(col("in_g3").isNull, "boilerplate")
            .otherwise("kept").as("verdict"))
        .orderBy(col("doc_id"))
    }),

    // exact-substring SELF-dedup (Lee et al. '22 policy, deterministic
    // form): 8-grams occurring in ≥ 2 distinct docs are excised from
    // all of them — alignment-free, unlike the fixed-window line dedup.
    // The corpus is its own benchmark; the repeated-gram minority
    // broadcasts, df counted over 16-byte (gram, id) rows.
    "q_self_excise" -> ((s, d) => {
      graft.ext.Contamination.selfExcise(Tables.documents(s, d),
          "doc_id", "text", n = 8, minDf = 2)
        .orderBy(col("doc_id"))
    })
  )

  /** Per-source keep-rates for the stratified-sample query: up-sample
    * the first five sources, mid-rate the next five, default the rest.
    * (Mirrored verbatim into the oracle SQL below.) */
  private val SampleRates: Map[String, Double] =
    ((0 to 4).map(i => s"src$i" -> 0.5) ++ (5 to 9).map(i => s"src$i" -> 0.25)).toMap

  /** Term-list redaction pattern — RE2-compatible so DuckDB agrees. */
  private val RedactPattern = "\\b(customer|value|table)\\b"

  /** 12 hours in epoch micros — both the q_range_join window span and
    * its bucket width (span == width keeps interval replication ≤ 2×). */
  private val RangeJoinWindowUs = 12L * 60 * 60 * 1000 * 1000

  /** Unrolled k-round BPE train+encode oracle. Each round recomputes
    * weighted pair counts over the current symbolization, takes the
    * SAME (cnt DESC, l, r) argmax as `Bpe.trainMerges`, and applies
    * the merge by literal `replace` over a bracketed ⟨STX⟩sym⟨ETX⟩
    * string: every symbol carries its own delimiter pair, so adjacent
    * merges share no characters and non-overlapping left-to-right
    * replace is exactly the trainer's greedy merge-skip-2 scan.
    * Tokens per word = the surviving ⟨STX⟩ count. */
  private def bpeEncodeOracle(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS MATERIALIZED (SELECT w, count(*) AS wc,
        |    regexp_replace(w, '(.)', chr(2) || '\1' || chr(3), 'g') AS s
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
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

  private def cdcCore(textExpr: String): String = {
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

  private def cdcOracle: String =
    cdcCore("coalesce(text, '')") +
      "SELECT * FROM chunks ORDER BY doc_id, chunk_idx"

  /** Shared staged-CTE prefix of the funnel3 oracle (through g3,
    * the boilerplate gate): q_curation_funnel3 appends the
    * shuffle-order finale, q_funnel_provenance the
    * first-failing-stage verdict — one derivation, two finales. */
  private def funnel3StagesCte: String =
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

  def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT doc_id, fp FROM (
        |  SELECT doc_id, sha256(text) AS fp,
        |         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram_jaccard" -> jaccardOracle,
    "q_dedup_ngram_capped" -> jaccardCappedOracle,
    // LSH candidate recall at J≥0.8 with 16 bands × 4 rows is
    // 1-(1-J^4)^16 > 1-1e-21 on this corpus — the verified MinHash
    // output equals the exact all-pairs result (checked at sf0.01).
    "q_dedup_minhash" -> jaccardOracle,
    "q_median_exact" ->
      """WITH hist AS (SELECT source, n_chars, count(*) AS c
        |              FROM documents GROUP BY 1, 2),
        |cum AS (SELECT source, n_chars, c,
        |          sum(c) OVER (PARTITION BY source ORDER BY n_chars
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM hist),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1)
        |SELECT source, n,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN n_chars END) AS median,
        |  min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN n_chars END) AS p90
        |FROM cum JOIN tot USING (source)
        |GROUP BY source, n ORDER BY source""".stripMargin,
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
    // the cluster CTE plus the q_split_assign threshold CASE, keyed on
    // cluster_id instead of doc_id
    "q_split_grouped" ->
      ("WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") +
        """,dpairs AS (
          |  SELECT i, j FROM inter JOIN sizes sa ON sa.doc_id = i
          |                         JOIN sizes sb ON sb.doc_id = j
          |  WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.8),
          |edges AS (SELECT i, j FROM dpairs UNION ALL SELECT j, i FROM dpairs),
          |reach(id, lbl) AS (
          |  SELECT doc_id, doc_id FROM documents
          |  UNION
          |  SELECT e.i, r.lbl FROM edges e JOIN reach r ON r.id = e.j),
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
    "q_dedup_embed" -> embedPairsOracle,
    // the LSH+verify path must reproduce the exact all-pairs result at
    // its own threshold over the planted-dup corpus
    "q_dedup_embed_lsh" -> embedPairsLshOracle,
    "q_knn_brute" ->
      """SELECT qid, cast(rank AS INT) AS rank, nid, round(score, 4) AS score FROM (
        |  SELECT q.vec_id AS qid, n.vec_id AS nid,
        |    list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS score,
        |    row_number() OVER (PARTITION BY q.vec_id
        |                       ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) DESC,
        |                                n.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // The ANN recall contracts: the engine computes per-query recall vs
    // the in-plan exact top-k; the oracle states the contract the ANN
    // must meet — every query recalls ≥ ⌈k·minRecall⌉ true neighbors.
    // A recall regression flips a boolean → hash mismatch → FAIL.
    "q_knn_lsh" ->
      """SELECT vec_id AS qid, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY qid""".stripMargin,
    "q_knn_ivf" ->
      """SELECT vec_id AS qid, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY qid""".stripMargin,
    // serving-shape contract: the planted source IS the top-1, exactly
    "q_knn_ivf_planted" ->
      """SELECT vec_id + 1000000 AS qid, true AS top1_ok FROM embeddings
        |WHERE vec_id < 50 ORDER BY qid""".stripMargin,
    // same serving contract through the int8 index + float re-rank
    "q_knn_ivf_quantized" ->
      """SELECT vec_id + 1000000 AS qid, true AS top1_ok FROM embeddings
        |WHERE vec_id < 50 ORDER BY qid""".stripMargin,
    // same serving contract through the PQ (ADC) index + float re-rank
    "q_knn_ivf_pq" ->
      """SELECT vec_id + 1000000 AS qid, true AS top1_ok FROM embeddings
        |WHERE vec_id < 50 ORDER BY qid""".stripMargin,
    "q_knn_quantized" ->
      """SELECT vec_id AS qid, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY qid""".stripMargin,
    // planted-duplicate contracts for the engine-specific-hash dedup
    // ops (see the query scaladocs for why each bound is what it is)
    "q_dedup_simhash" ->
      """SELECT count(*) AS n_docs, true AS exact_complete, true AS pert_recall_ok
        |FROM documents""".stripMargin,
    "q_winnow_pairs" ->
      """SELECT doc_id, true AS planted_found, true AS overlap_exact
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_source_similarity" ->
      """SELECT g, true AS ok FROM (
        |  SELECT 'clone_exact' AS g
        |  UNION ALL
        |  SELECT DISTINCT source FROM documents WHERE source <> 'src0')
        |ORDER BY g""".stripMargin,
    "q_lang_id" ->
      s"""SELECT doc_id, ${TextStats.langIdSql("text")} AS lang_pred
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
    "q_quality_score" ->
      s"""SELECT doc_id, ${TextStats.qualitySql("text")} AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_stats" ->
      s"""SELECT doc_id,
         |  cast(len(string_split(text, ' ')) AS INT) AS ws_tokens,
         |  cast(len(regexp_extract_all(text, '${TextStats.SubwordRegexSql}')) AS INT) AS subword_pieces
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      "SELECT doc_id, sha256(text) AS fp FROM documents ORDER BY doc_id",
    "q_corpus_checksum" ->
      """SELECT source, count(*) AS n_docs,
        |  bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)) AS xor_sig
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_zorder_layout" ->
      s"""WITH z AS (
         |  SELECT doc_id % 65536 AS a, n_chars % 65536 AS b,
         |    ${graft.ext.Layout.zorderSql("doc_id % 65536", "n_chars % 65536")} AS zval
         |  FROM documents)
         |SELECT zval >> 18 AS tile, count(*) AS n,
         |  min(a) AS a_min, max(a) AS a_max, min(b) AS b_min, max(b) AS b_max,
         |  (max(a) - min(a) < 512) AS a_bounded,
         |  (max(b) - min(b) < 512) AS b_bounded
         |FROM z GROUP BY 1 ORDER BY tile""".stripMargin,
    "q_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(coalesce(text, '')) AS old_md5
        |            FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN coalesce(text, '') || ' [rev2]'
        |             ELSE coalesce(text, '') END) AS new_md5
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 5000000 AS doc_id,
        |    md5('new shard ' || CAST(doc_id AS VARCHAR)) AS new_md5
        |  FROM documents WHERE doc_id % 13 = 0)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, old_md5, new_md5,
        |  CASE WHEN old_md5 IS NULL THEN 'added'
        |       WHEN new_md5 IS NULL THEN 'removed'
        |       WHEN old_md5 <> new_md5 THEN 'modified'
        |       ELSE 'unchanged' END AS status
        |FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_approx_distinct" ->
      """WITH t AS (
        |  SELECT source, count(DISTINCT tok) AS n_tok_exact
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> '' GROUP BY source),
        |i AS (SELECT source, count(DISTINCT doc_id) AS n_id_exact
        |      FROM documents GROUP BY source)
        |SELECT source, n_tok_exact, n_id_exact,
        |  true AS tok_sketch_ok, true AS id_sketch_ok
        |FROM t JOIN i USING (source) ORDER BY source""".stripMargin,
    "q_tfidf_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok, tf, df,
        |    round(tf * ln((n_docs + 1.0) / (df + 1.0)), 4) AS score
        |  FROM tf JOIN df USING (tok) CROSS JOIN n),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |  ORDER BY score DESC, tok) AS rank FROM scored)
        |SELECT doc_id, tok, tf, df, score, cast(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // DuckDB's native ASOF JOIN: an independent engine's implementation
    // of the same inclusive point-in-time semantics
    "q_asof_join" ->
      """SELECT e.user_id, e.event_id, epoch_ns(e.ts) // 1000 AS tus,
        |  epoch_ns(p.ts) // 1000 AS prior_tus, p.value AS prior_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.user_id, tus, e.event_id""".stripMargin,
    // nearest-|Δt| argmin per click via LATERAL; tie → earlier p.ts —
    // the same deterministic rule as the union-tag plan's db<=df pick
    "q_asof_nearest" ->
      """SELECT e.user_id, e.event_id, epoch_ns(e.ts) // 1000 AS tus,
        |  epoch_ns(p.pts) // 1000 AS near_tus, p.value AS near_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') e
        |LEFT JOIN LATERAL (
        |  SELECT r.ts AS pts, r.value
        |  FROM events r
        |  WHERE r.event_type = 'purchase' AND r.user_id = e.user_id
        |  ORDER BY abs(epoch_ns(r.ts) - epoch_ns(e.ts)), r.ts LIMIT 1) p ON true
        |ORDER BY e.user_id, tus, e.event_id""".stripMargin,
    // identical sign matrix from the same md5 parity; integer sums
    // can't drift
    "q_embed_project" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding::DOUBLE[],
        |                   x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS q
        |  FROM embeddings),
        |s AS (SELECT k, i,
        |        CASE WHEN substr(md5(CAST(i AS VARCHAR) || '_' || CAST(k AS VARCHAR)), 1, 1)
        |               BETWEEN '0' AND '7' THEN 1 ELSE -1 END AS sgn
        |      FROM range(16) t1(k), range(64) t2(i))
        |SELECT e.vec_id, CAST(s.k AS INT) AS k,
        |  CAST(sum(s.sgn * e.q[s.i + 1]) AS BIGINT) AS p
        |FROM e, s GROUP BY 1, 2 ORDER BY vec_id, k""".stripMargin,
    // aggregate planted-dup contract (the per-query booleans would be
    // engine-specific at the 0.1% tail — see the query scaladoc)
    "q_knn_projected" ->
      """SELECT count(*) AS n_queries, true AS jl_top1_ok
        |FROM embeddings""".stripMargin,
    "q_asof_join_fwd" ->
      """SELECT e.user_id, e.event_id, epoch_ns(e.ts) // 1000 AS tus,
        |  epoch_ns(p.ts) // 1000 AS next_tus, p.value AS next_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY e.user_id, tus, e.event_id""".stripMargin,
    // the salted two-phase form must equal the direct aggregate
    "q_salted_agg" ->
      """SELECT event_type, cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the salted join must equal the plain join (aggregated compactly)
    "q_salted_join" ->
      """SELECT substring(md5(event_type), 1, 8) AS type_code, count(*) AS n,
        |  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the AQE-left join must equal the direct evaluation (sum of each
    // token's document frequency per doc — integer-exact)
    "q_skew_aqe_join" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tt AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
        |f AS (SELECT tok, count(*) AS df FROM tt GROUP BY 1)
        |SELECT doc_id, count(*) AS n_tok, CAST(sum(df) AS BIGINT) AS sum_df
        |FROM tt JOIN f USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_skew_stats" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tt AS (SELECT tok FROM t WHERE tok <> ''),
        |f AS (SELECT tok, count(*) AS cnt FROM tt GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |          count(*) AS n_keys FROM f)
        |SELECT tok, cnt, n_keys,
        |  floor(CAST(cnt AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS share,
        |  floor(CAST(cnt AS DOUBLE) * n_keys / total * 1e2 + 0.5) / 1e2 AS x_mean
        |FROM f CROSS JOIN tot
        |ORDER BY cnt DESC, tok LIMIT 10""".stripMargin,
    // plain inequality join — DuckDB evaluates the range predicate
    // directly (no bucketing), an independent check of the rewrite
    "q_range_join" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_clicks,
        |  min(epoch_ns(c.ts) // 1000) AS first_click_us
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_ns(c.ts) // 1000
        |     BETWEEN epoch_ns(p.ts) // 1000
        |         AND epoch_ns(p.ts) // 1000 + 43200000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same window arithmetic (64-token chunks, stride 48), same
    // single-space tokenization as the Spark side
    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |        unnest(range(0, CASE WHEN len(toks) <= 64 THEN 1
        |          ELSE CAST(ceil((len(toks) - 64)::DOUBLE / 48) AS BIGINT) + 1 END)) AS chunk_idx
        |      FROM t)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(len(toks[chunk_idx*48 + 1 : chunk_idx*48 + 64]) AS INT) AS chunk_tokens,
        |  md5(array_to_string(toks[chunk_idx*48 + 1 : chunk_idx*48 + 64], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // same windows, same running-sum binning, all integers
    "q_chunk_pack" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, source, toks,
        |        unnest(range(0, CASE WHEN len(toks) <= 64 THEN 1
        |          ELSE CAST(ceil((len(toks) - 64)::DOUBLE / 48) AS BIGINT) + 1 END)) AS chunk_idx
        |      FROM t),
        |ch AS (SELECT doc_id, source, CAST(chunk_idx AS INT) AS chunk_idx,
        |         CAST(len(toks[chunk_idx*48 + 1 : chunk_idx*48 + 64]) AS INT) AS chunk_tokens
        |       FROM c)
        |SELECT doc_id, chunk_idx, source, chunk_tokens,
        |  (CAST(sum(chunk_tokens) OVER w AS BIGINT) - chunk_tokens) // 512 AS bin
        |FROM ch
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id, chunk_idx
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY source, doc_id, chunk_idx""".stripMargin,
    // exact membership is SQL; the sketch's one-sided-error invariant
    // is the boolean the engine must never flip
    "q_bloom_screen" ->
      """SELECT doc_id,
        |  text IN (SELECT text FROM documents WHERE doc_id % 7 = 0) AS is_member,
        |  true AS no_false_negative
        |FROM documents ORDER BY doc_id""".stripMargin,
    // independent evaluation: plain NOT IN against the existing texts
    "q_dedup_incremental" ->
      """SELECT doc_id FROM documents
        |WHERE doc_id % 3 = 0
        |  AND text NOT IN (SELECT text FROM documents WHERE doc_id % 3 <> 0)
        |ORDER BY doc_id""".stripMargin,
    // same symmetric scheme (scale = 127/max|v|, half-up floor) in
    // DuckDB list algebra; checksum/l1 are integer-exact, recon cosine
    // is far from its 0.99 bound (int8 error is O(1/254) per element)
    "q_embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0
        |         THEN 127.0 / list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
        |         ELSE 0.0 END AS scale
        |  FROM embeddings),
        |qq AS (SELECT vec_id, v,
        |         list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qvec
        |       FROM q)
        |SELECT vec_id,
        |  CAST(list_sum(list_transform(qvec, (x, i) -> x * i)) AS BIGINT) AS checksum,
        |  CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT) AS l1,
        |  list_cosine_similarity(v, qvec::DOUBLE[]) >= 0.99 AS recon_ok
        |FROM qq ORDER BY vec_id""".stripMargin,
    // the payload is ASCII text, so byte slicing == char slicing and
    // md5(VARCHAR) hashes the same bytes as Spark's md5(BINARY slice)
    "q_multimodal_frames" ->
      """SELECT doc_id, cast(frame_idx AS INT) AS frame_idx,
        |  cast(length(substring(text, frame_idx * 32 + 1, 32)) AS INT) AS frame_bytes,
        |  md5(substring(text, frame_idx * 32 + 1, 32)) AS frame_md5
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, cast(ceil(length(text) / 32.0) AS BIGINT), 2)) AS frame_idx
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // analytic mirror of the planted raster: dims, container, and the
    // gray sum over the w×h grid are closed-form in doc_id (see
    // Multimodal.plantedW/H/Gray) — matching is only possible if
    // Spark's ImageIO round trip preserved every planted pixel; the
    // format column is what the sniffing READER reports (the JDK TIFF
    // reader names itself 'tif')
    "q_multimodal_decode" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |                   8 + (doc_id * 7) % 25 AS h FROM documents),
        |px  AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CASE WHEN doc_id % 4 = 0 THEN 'bmp'
        |       WHEN doc_id % 4 = 2 THEN 'tif' ELSE 'png' END AS format,
        |  CAST(sum((x * 3 + y * 5 + doc_id) % 256) AS BIGINT) AS px_sum
        |FROM pxy GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    // nearest-neighbor to 8×8 with sx = i·w // 8, sy = j·h // 8 (the
    // integer-division convention the engine implements); positional
    // checksum Σ (j·8+i+1)·gray is order-sensitive, so a transposed or
    // off-by-one resample cannot pass
    "q_multimodal_resize" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |                   8 + (doc_id * 7) % 25 AS h FROM documents),
        |ci  AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS i FROM d),
        |cij AS (SELECT doc_id, w, h, i, unnest(range(0, 8)) AS j FROM ci)
        |SELECT doc_id,
        |  CAST(sum((j * 8 + i + 1) *
        |           ((((i * w) // 8) * 3 + ((j * h) // 8) * 5 + doc_id) % 256))
        |       AS BIGINT) AS px_checksum,
        |  CAST(sum((((i * w) // 8) * 3 + ((j * h) // 8) * 5 + doc_id) % 256)
        |       AS BIGINT) AS px_sum
        |FROM cij GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // analytic mirror of the oriented resize: orientation o cycles all
    // eight spec values with 1 + doc_id % 8; display dims swap for
    // 5-8; display pixel (x, y) pulls the planted gray through each
    // orientation's closed-form inverse map (2/4 mirror, 5 transpose,
    // 6: src(y, h−1−x); 7 transverse; 8: src(w−1−y, x); 3: 180°),
    // then nearest-neighbor to 8×8 as in q_multimodal_resize
    "q_multimodal_resize_oriented" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w, 8 + (doc_id * 7) % 25 AS h,
        |             1 + doc_id % 8 AS o
        |           FROM documents),
        |dd AS (SELECT doc_id, w, h, o,
        |         CASE WHEN o >= 5 THEN h ELSE w END AS rw,
        |         CASE WHEN o >= 5 THEN w ELSE h END AS rh FROM d),
        |ci  AS (SELECT doc_id, w, h, o, rw, rh, unnest(range(0, 8)) AS i FROM dd),
        |cij AS (SELECT doc_id, w, h, o, rw, rh, i, unnest(range(0, 8)) AS j FROM ci),
        |m AS (SELECT doc_id, o, w, h, i, j,
        |        (i * rw) // 8 AS x, (j * rh) // 8 AS y FROM cij),
        |g AS (SELECT doc_id, o, i, j,
        |        CASE o WHEN 1 THEN (x * 3 + y * 5 + doc_id) % 256
        |               WHEN 2 THEN ((w - 1 - x) * 3 + y * 5 + doc_id) % 256
        |               WHEN 3 THEN ((w - 1 - x) * 3 + (h - 1 - y) * 5 + doc_id) % 256
        |               WHEN 4 THEN (x * 3 + (h - 1 - y) * 5 + doc_id) % 256
        |               WHEN 5 THEN (y * 3 + x * 5 + doc_id) % 256
        |               WHEN 6 THEN (y * 3 + (h - 1 - x) * 5 + doc_id) % 256
        |               WHEN 7 THEN ((w - 1 - y) * 3 + (h - 1 - x) * 5 + doc_id) % 256
        |               ELSE ((w - 1 - y) * 3 + x * 5 + doc_id) % 256 END AS gray
        |      FROM m)
        |SELECT doc_id, CAST(o AS INT) AS orientation,
        |  CAST(sum((j * 8 + i + 1) * gray) AS BIGINT) AS px_checksum,
        |  CAST(sum(gray) AS BIGINT) AS px_sum
        |FROM g GROUP BY doc_id, o ORDER BY doc_id""".stripMargin,
    // analytic mirror of the planted PCM: n = 64 + id % 129 samples of
    // s(k) = ((id·31 + k·17) % 4096) − 2048 at 8 kHz mono — matching
    // is only possible if the WAV round trip preserved every sample
    "q_audio_decode" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS k FROM d)
        |SELECT doc_id, CAST(n AS INT) AS n_samples, 8000 AS sample_rate,
        |  1 AS channels,
        |  CAST(sum(((doc_id * 31 + k * 17) % 4096) - 2048) AS BIGINT)
        |    AS sample_sum,
        |  CAST(sum((k + 1) * (((doc_id * 31 + k * 17) % 4096) - 2048)) AS BIGINT)
        |    AS sample_checksum
        |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    // dHash rebuilt bit-by-bit from the planted pixel algebra: the
    // resample index is src = dst*dim//target (the resizeNearest
    // convention), gray is (x*3 + y*5 + id) % 256, a bit is set iff
    // the right neighbor is strictly brighter; hi/lo 32-bit halves
    // sidestep BIGINT shift-63 sign trouble
    "q_image_dhash" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w,
        |                  8 + (doc_id * 7) % 25 AS h FROM documents),
        |g AS (SELECT doc_id, j, i,
        |        ((i * w // 9) * 3 + (j * h // 8) * 5 + doc_id) % 256 AS p0,
        |        (((i + 1) * w // 9) * 3 + (j * h // 8) * 5 + doc_id) % 256 AS p1
        |      FROM d, unnest(range(0, 8)) AS u(j), unnest(range(0, 8)) AS v(i)),
        |hl AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i >= 32
        |                      THEN (1::BIGINT << (j*8 + i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i < 32
        |                      THEN (1::BIGINT << (j*8 + i)) ELSE 0 END) AS BIGINT) AS lo
        |       FROM g GROUP BY 1)
        |SELECT doc_id, printf('%08x%08x', hi, lo) AS dhash_hex
        |FROM hl ORDER BY doc_id""".stripMargin,
    // near-dup pairs via the same analytic hash: copies (id + 1e6)
    // inherit their original's planted raster, so equal-hash pairs —
    // each (id, id+1e6) plus any structural collisions — fall out of
    // one self-join over the derived hashes
    "q_image_neardup" ->
      """WITH ids AS (SELECT doc_id FROM documents
        |             UNION ALL SELECT doc_id + 1000000 FROM documents),
        |src AS (SELECT doc_id, doc_id % 1000000 AS sid FROM ids),
        |d AS (SELECT doc_id, sid, 8 + sid % 25 AS w,
        |             8 + (sid * 7) % 25 AS h FROM src),
        |g AS (SELECT doc_id, j, i,
        |        ((i * w // 9) * 3 + (j * h // 8) * 5 + sid) % 256 AS p0,
        |        (((i + 1) * w // 9) * 3 + (j * h // 8) * 5 + sid) % 256 AS p1
        |      FROM d, unnest(range(0, 8)) AS u(j), unnest(range(0, 8)) AS v(i)),
        |hl AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i >= 32
        |                      THEN (1::BIGINT << (j*8 + i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i < 32
        |                      THEN (1::BIGINT << (j*8 + i)) ELSE 0 END) AS BIGINT) AS lo
        |       FROM g GROUP BY 1),
        |h AS (SELECT doc_id, printf('%08x%08x', hi, lo) AS hex FROM hl)
        |SELECT a.doc_id AS i, b.doc_id AS j
        |FROM h a JOIN h b ON a.hex = b.hex AND a.doc_id < b.doc_id
        |ORDER BY i, j""".stripMargin,
    // image funnel: planted dims + the analytic dHash, size-gated,
    // keep-first per fingerprint
    "q_image_funnel" ->
      """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 25 AS INT) AS w,
        |                  CAST(8 + (doc_id * 7) % 25 AS INT) AS h FROM documents),
        |g AS (SELECT doc_id, j, i,
        |        ((i * w // 9) * 3 + (j * h // 8) * 5 + doc_id) % 256 AS p0,
        |        (((i + 1) * w // 9) * 3 + (j * h // 8) * 5 + doc_id) % 256 AS p1
        |      FROM d, unnest(range(0, 8)) AS u(j), unnest(range(0, 8)) AS v(i)),
        |hl AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i >= 32
        |                      THEN (1::BIGINT << (j*8 + i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |        CAST(sum(CASE WHEN p1 > p0 AND j*8 + i < 32
        |                      THEN (1::BIGINT << (j*8 + i)) ELSE 0 END) AS BIGINT) AS lo
        |       FROM g GROUP BY 1),
        |p AS (SELECT d.doc_id, d.w AS width, d.h AS height,
        |        printf('%08x%08x', hi, lo) AS dhash_hex
        |      FROM d JOIN hl USING (doc_id)
        |      WHERE d.w * d.h >= 300),
        |k AS (SELECT *, row_number() OVER (PARTITION BY dhash_hex
        |        ORDER BY doc_id) AS rn FROM p)
        |SELECT doc_id, width, height, dhash_hex FROM k
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // MP4 box-tree walk vs the planted container algebra: duration,
    // track count, stsd fourccs in document order, first video track's
    // 16.16 tkhd dimensions
    "q_video_meta" ->
      """SELECT doc_id,
        |  CAST(1000 + doc_id % 9000 AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 3 AS INT) AS n_tracks,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'avc1'
        |       WHEN 1 THEN 'avc1,mp4a'
        |       ELSE 'avc1,mp4a,hvc1' END AS codecs,
        |  CAST(320 + 16 * (doc_id % 8) AS INT) AS width,
        |  CAST(240 + 16 * (doc_id % 5) AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // audio fingerprint: window of sample k is k*33//n, energies are
    // exact integer sums of squares of the planted samples, bit w set
    // iff e[w+1] > e[w]
    "q_audio_fingerprint" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
        |s AS (SELECT doc_id, n, k,
        |        ((doc_id * 31 + k * 17) % 4096) - 2048 AS v
        |      FROM d, unnest(range(0, n)) AS u(k)),
        |e AS (SELECT doc_id, (k * 33) // n AS w,
        |        CAST(sum(v * v) AS BIGINT) AS energy
        |      FROM s GROUP BY 1, 2),
        |p AS (SELECT a.doc_id, a.w,
        |        CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
        |      FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.w = a.w + 1
        |      WHERE a.w < 32)
        |SELECT doc_id,
        |  printf('%08x', CAST(sum(bit * (1::BIGINT << w)) AS BIGINT)) AS afp_hex
        |FROM p GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // deterministic sampling: md5 hex compared lexicographically — the
    // thresholds are Sampling.thresholdHex(rate) values verbatim
    "q_sample_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) <
        |  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN '80000000'
        |       WHEN source IN ('src5','src6','src7','src8','src9') THEN '40000000'
        |       ELSE '20000000' END
        |ORDER BY doc_id""".stripMargin,
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
    // the same 80/10/10 selector ranges as thresholdHex(0.8/0.9)
    "q_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccccccd' THEN 'train'
        |       WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    // identical rate → threshold derivation: integer token totals,
    // IEEE double division, floor(x+0.5) (NOT round(): Spark half-up
    // vs DuckDB half-even), %08x hex — bit-identical thresholds
    "q_mix_sources" ->
      """WITH tot AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_s
        |             FROM documents GROUP BY 1),
        |m AS (SELECT min(t_s) AS m FROM tot),
        |th AS (SELECT source,
        |         CASE WHEN CAST(m.m AS DOUBLE) / CAST(t_s AS DOUBLE) >= 1.0 THEN 'g'
        |              ELSE printf('%08x', CAST(least(
        |                floor(CAST(m.m AS DOUBLE) / CAST(t_s AS DOUBLE) * 4294967296.0 + 0.5),
        |                4294967295.0) AS BIGINT)) END AS thresh
        |       FROM tot, m)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN th USING (source)
        |WHERE md5(CAST(d.doc_id AS VARCHAR)) < th.thresh
        |ORDER BY d.doc_id""".stripMargin,
    // same √n temperature plan: floored-6-decimal sqrt terms summed as
    // DECIMAL (order-free), double ratios floored to 4 decimals, the
    // budget an integer floor-quarter of total tokens — every emitted
    // double identical bit-for-bit cross-engine
    "q_source_mixture" ->
      """WITH p AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
        |         AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |s AS (SELECT *,
        |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |             AS DECIMAL(24,6)) AS sq
        |      FROM p),
        |tot AS (SELECT CAST(sum(sq) AS DECIMAL(38,6)) AS sqsum,
        |               CAST(sum(n_tokens) AS BIGINT) // 4 AS budget FROM s)
        |SELECT source, n_docs, n_tokens,
        |  floor(CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS weight,
        |  least(1.0, floor(CAST(budget AS DOUBLE) *
        |      (floor(CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE) * 1e4 + 0.5) / 1e4) /
        |      CAST(n_tokens AS DOUBLE) * 1e4 + 0.5) / 1e4) AS rate
        |FROM s CROSS JOIN tot ORDER BY source""".stripMargin,
    "q_sample_per_source" ->
      """SELECT doc_id, source, rank FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
        |  FROM documents
        |  WHERE md5(CAST(doc_id AS VARCHAR)) < '80000000') t
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "q_redact_terms" ->
      """SELECT doc_id,
        |  regexp_replace(text, '\b(customer|value|table)\b', '<TERM>', 'g') AS red_text
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    "q_gzip_ingest" ->
      """SELECT doc_id,
        |  (doc_id % 97 <> 0) AS ok,
        |  CASE WHEN doc_id % 97 <> 0
        |       THEN CAST(strlen(coalesce(text,'')) AS BIGINT)
        |       ELSE 0 END AS n_bytes,
        |  CASE WHEN doc_id % 97 <> 0 THEN md5(coalesce(text,''))
        |       ELSE '' END AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Mirrors gzipMembersPlantedCol's slice algebra exactly: slice
    // size a = length/3 (chars), members [1,a], [a+1,a], [2a+1, rest];
    // doc_id%101==0 corrupts member 1 only. strlen() gives the UTF-8
    // byte count of the slice = the decoded member's byte length.
    "q_gzip_members" ->
      """WITH d AS (SELECT doc_id, coalesce(text,'') AS t,
        |                  length(coalesce(text,'')) AS n
        |           FROM documents),
        |m AS (SELECT doc_id, i,
        |        CASE WHEN i = 0 THEN substr(t, 1, n // 3)
        |             WHEN i = 1 THEN substr(t, n // 3 + 1, n // 3)
        |             ELSE substr(t, 2 * (n // 3) + 1) END AS part,
        |        (doc_id % 101 = 0 AND i = 1) AS corrupt
        |      FROM d, (SELECT unnest(range(3)) AS i))
        |SELECT doc_id, CAST(i AS INT) AS member_idx,
        |  NOT corrupt AS ok,
        |  CASE WHEN corrupt THEN 0
        |       ELSE CAST(strlen(part) AS BIGINT) END AS n_bytes,
        |  CASE WHEN corrupt THEN '' ELSE md5(part) END AS text_md5
        |FROM m ORDER BY doc_id, member_idx""".stripMargin,
    // Same slice algebra as q_gzip_members plus the analytic member
    // name; only a genuine deflate→inflate round trip with CRC verify
    // can reproduce the clean members, and the damaged member must
    // surface the error contract without losing its neighbors
    "q_zip_members" ->
      """WITH d AS (SELECT doc_id, coalesce(text,'') AS t,
        |                  length(coalesce(text,'')) AS n
        |           FROM documents),
        |m AS (SELECT doc_id, i,
        |        CASE WHEN i = 0 THEN substr(t, 1, n // 3)
        |             WHEN i = 1 THEN substr(t, n // 3 + 1, n // 3)
        |             ELSE substr(t, 2 * (n // 3) + 1) END AS part,
        |        (doc_id % 101 = 0 AND i = 1) AS corrupt
        |      FROM d, (SELECT unnest(range(3)) AS i))
        |SELECT doc_id, CAST(i AS INT) AS member_idx,
        |  CASE WHEN corrupt THEN ''
        |       ELSE 'doc' || CAST(doc_id AS VARCHAR) || '/part' ||
        |            CAST(i AS VARCHAR) || '.txt' END AS name,
        |  NOT corrupt AS ok,
        |  CASE WHEN corrupt THEN 0
        |       ELSE CAST(strlen(part) AS BIGINT) END AS n_bytes,
        |  CASE WHEN corrupt THEN '' ELSE md5(part) END AS text_md5
        |FROM m ORDER BY doc_id, member_idx""".stripMargin,
    // Same slice algebra as q_gzip_members plus the analytic name and
    // mtime the planted archive wrote; a corrupt member surfaces the
    // error contract while its neighbors stay intact (resync proof)
    "q_tar_members" ->
      """WITH d AS (SELECT doc_id, coalesce(text,'') AS t,
        |                  length(coalesce(text,'')) AS n
        |           FROM documents),
        |m AS (SELECT doc_id, i,
        |        CASE WHEN i = 0 THEN substr(t, 1, n // 3)
        |             WHEN i = 1 THEN substr(t, n // 3 + 1, n // 3)
        |             ELSE substr(t, 2 * (n // 3) + 1) END AS part,
        |        (doc_id % 101 = 0 AND i = 1) AS corrupt
        |      FROM d, (SELECT unnest(range(3)) AS i))
        |SELECT doc_id, CAST(i AS INT) AS member_idx,
        |  CASE WHEN corrupt THEN ''
        |       ELSE 'doc' || CAST(doc_id AS VARCHAR) || '/part' ||
        |            CAST(i AS VARCHAR) || '.txt' END AS name,
        |  NOT corrupt AS ok,
        |  CASE WHEN corrupt THEN 0
        |       ELSE CAST(strlen(part) AS BIGINT) END AS n_bytes,
        |  CASE WHEN corrupt THEN 0
        |       ELSE 1700000000 + doc_id END AS mtime,
        |  CASE WHEN corrupt THEN '' ELSE md5(part) END AS text_md5
        |FROM m ORDER BY doc_id, member_idx""".stripMargin,
    // Analytic mirror of Urls.plantedUrlCol: every field is a pure
    // function of (source, lang, doc_id)
    "q_url_parse" ->
      """SELECT doc_id,
        |  'https://' ||
        |    CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END ||
        |    lower(source) || '-' || CAST(doc_id % 5 AS VARCHAR) ||
        |    '.example.com/' || lang || '/' ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'sub/' ELSE '' END ||
        |    CAST(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 5 = 0 THEN '?session=abc' ELSE '' END AS url,
        |  lower(source) || '-' || CAST(doc_id % 5 AS VARCHAR)
        |    || '.example.com' AS domain,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS INT)
        |    AS path_depth,
        |  (doc_id % 5 = 0) AS has_query
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_domain_cap" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |             lower(source) || '-' || CAST(doc_id % 5 AS VARCHAR)
        |               || '.example.com' AS domain
        |           FROM documents),
        |r AS (SELECT domain, doc_id,
        |        row_number() OVER (PARTITION BY domain
        |          ORDER BY n_chars DESC, doc_id) AS rk,
        |        count(*) OVER (PARTITION BY domain) AS domain_docs
        |      FROM d)
        |SELECT domain, doc_id, CAST(rk AS INT) AS rk,
        |  CAST(domain_docs AS BIGINT) AS domain_docs
        |FROM r WHERE rk <= 3 ORDER BY domain, doc_id""".stripMargin,
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
    "q_shuffle_order" ->
      """WITH s AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sel
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(strpos('0123456789abcdef', substr(sel,1,1)) - 1 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY substr(sel,1,1)
        |         ORDER BY substr(sel,2), doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "q_vocab_topn" ->
      """SELECT tok, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |WHERE tok <> '' GROUP BY tok
        |ORDER BY cnt DESC, tok LIMIT 20""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |             len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |        CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM t)
        |SELECT doc_id, source, CAST(n_tok AS INT) AS n_tok, cum,
        |  (cum - n_tok) // 500 AS bin
        |FROM c ORDER BY source, doc_id""".stripMargin,
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
    "q_corpus_stats_approx" ->
      """SELECT source, count(*) AS n_docs, true AS median_rank_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_corpus_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  quantile_cont(n_chars, 0.25) AS q1_chars,
        |  quantile_cont(n_chars, 0.5) AS median_chars,
        |  quantile_cont(n_chars, 0.75) AS q3_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // curation funnel: each stage reuses its already-proven SQL mirror
    "q_curation_funnel" ->
      s"""WITH scored AS (
         |  SELECT doc_id, text, source,
         |    ${TextStats.langIdSql("text")} AS lang_pred,
         |    ${TextStats.qualitySql("text")} AS quality
         |  FROM documents),
         |gated AS (
         |  SELECT * FROM scored WHERE lang_pred = 'en' AND quality >= 0.5),
         |deduped AS (
         |  SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
         |  FROM gated)
         |SELECT doc_id, source, quality FROM deduped
         |WHERE rn = 1 AND md5(CAST(doc_id AS VARCHAR)) < '80000000'
         |ORDER BY doc_id""".stripMargin,
    // contamination: distinct 3-grams per doc (same tok-self-join form
    // as the dedup oracles), benchmark = src0, flag at ≥10% overlap via
    // integer compare so engines can't disagree on rounding
    "q_contamination" ->
      """WITH tok AS (
        |  SELECT doc_id, source, generate_subscripts(t,1) pos, unnest(t) w
        |  FROM (SELECT doc_id, source, string_split(text,' ') t FROM documents)),
        |sh AS (SELECT DISTINCT a.doc_id, a.source, a.w || ' ' || b.w || ' ' || c.w AS s
        |       FROM tok a JOIN tok b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
        |                  JOIN tok c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
        |bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
        |cand AS (SELECT doc_id, s FROM sh WHERE source <> 'src0')
        |SELECT cand.doc_id, count(*) AS n_sh, count(bench.s) AS n_hit,
        |  (count(bench.s) * 100 >= count(*) * 10) AS contaminated
        |FROM cand LEFT JOIN bench ON cand.s = bench.s
        |GROUP BY cand.doc_id
        |ORDER BY doc_id""".stripMargin,
    // excision: same shared-3-gram rule; a token at 1-based position p
    // is cut iff a shared gram starts in [p-2, p]
    // cross-corpus exact-Jaccard (all pairs between the two splits) —
    // the LSH banding must recover every pair at 0.8, same contract
    // the self-join jaccardOracle pins for q_dedup_minhash
    "q_decontaminate_neardup" ->
      """WITH tok AS (SELECT doc_id, generate_subscripts(t,1) pos, unnest(t) w
        |             FROM (SELECT doc_id, string_split(text,' ') t FROM documents)),
        |sh AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
        |       FROM tok a JOIN tok b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
        |                  JOIN tok c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
        |sizes AS (SELECT doc_id, count(*) n_sh FROM sh GROUP BY 1),
        |train AS (SELECT doc_id FROM documents
        |          WHERE source NOT IN ('src0','src1','src2','src3','src4')),
        |bench AS (SELECT doc_id FROM documents
        |          WHERE source IN ('src0','src1','src2','src3','src4')),
        |inter AS (SELECT a.doc_id i, b.doc_id j, count(*) c
        |          FROM sh a JOIN sh b ON a.s = b.s
        |          JOIN train t ON t.doc_id = a.doc_id
        |          JOIN bench x ON x.doc_id = b.doc_id
        |          GROUP BY 1, 2)
        |SELECT i AS doc_id, j AS bench_id,
        |  floor(c * 1.0 / (sa.n_sh + sb.n_sh - c) * 10000 + 0.5) / 10000 AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = i JOIN sizes sb ON sb.doc_id = j
        |WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.8
        |ORDER BY doc_id, bench_id""".stripMargin,

    "q_decontaminate" ->
      """WITH cand AS (SELECT doc_id, string_split(text, ' ') AS toks
        |              FROM documents WHERE source <> 'src0'),
        |bench AS (SELECT DISTINCT array_to_string(toks[i : i + 2], ' ') AS g
        |          FROM (SELECT string_split(text, ' ') AS toks
        |                FROM documents WHERE source = 'src0'),
        |               unnest(CASE WHEN len(toks) >= 3 THEN generate_series(1, len(toks) - 2)
        |                           ELSE [] END) AS u(i)),
        |candg AS (SELECT doc_id, i AS pos, array_to_string(toks[i : i + 2], ' ') AS g
        |          FROM cand,
        |               unnest(CASE WHEN len(toks) >= 3 THEN generate_series(1, len(toks) - 2)
        |                           ELSE [] END) AS u(i)),
        |bad AS (SELECT doc_id, list(DISTINCT pos) AS bad_starts
        |        FROM candg JOIN bench USING (g) GROUP BY doc_id),
        |cleaned AS (
        |  SELECT c.doc_id,
        |    list_filter(c.toks, (t, p) ->
        |      len(list_filter(coalesce(b.bad_starts, []), x -> x >= p - 2 AND x <= p)) = 0) AS kept,
        |    len(c.toks) AS n_tok
        |  FROM cand c LEFT JOIN bad b USING (doc_id))
        |SELECT doc_id,
        |  coalesce(array_to_string(kept, ' '), '') AS clean_text,
        |  CAST(n_tok - len(kept) AS INT) AS n_removed
        |FROM cleaned ORDER BY doc_id""".stripMargin,
    // v2 funnel: the four stage mirrors chained as CTEs
    "q_curation_funnel2" ->
      s"""WITH n0 AS (SELECT doc_id, ${TextStats.normalizeSql("text")} AS norm
         |            FROM documents),
         |dd AS (SELECT doc_id, norm FROM (
         |         SELECT doc_id, norm,
         |           row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
         |         FROM n0) t
         |       WHERE rn = 1),
         |d AS (SELECT doc_id, string_split(coalesce(norm,''),' ') AS arr FROM dd),
         |e AS (SELECT doc_id, arr,
         |        unnest(range(CAST(ceil(len(arr)/8.0) AS BIGINT))) AS seg
         |      FROM d),
         |s AS (SELECT doc_id, seg,
         |        array_to_string(arr[(seg*8+1):(seg*8+8)],' ') AS segtext
         |      FROM e),
         |f AS (SELECT segtext, count(DISTINCT doc_id) AS df FROM s GROUP BY 1),
         |k AS (SELECT s.doc_id FROM s JOIN f USING (segtext) WHERE f.df < 2),
         |c AS (SELECT doc_id, count(*) AS kept_segs FROM k GROUP BY 1),
         |t AS (SELECT doc_id, CAST(ceil(len(arr)/8.0) AS BIGINT) AS total_segs
         |      FROM d),
         |g AS (SELECT t.doc_id,
         |        CAST(coalesce(c.kept_segs,0) AS BIGINT) AS kept_segs,
         |        t.total_segs
         |      FROM t LEFT JOIN c USING (doc_id)
         |      WHERE coalesce(c.kept_segs,0) > 0
         |        AND coalesce(c.kept_segs,0)*2 >= t.total_segs),
         |sh AS (SELECT doc_id, kept_segs, total_segs,
         |         md5(CAST(doc_id AS VARCHAR)) AS sel FROM g)
         |SELECT doc_id,
         |  CAST(strpos('0123456789abcdef', substr(sel,1,1)) - 1 AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY substr(sel,1,1)
         |         ORDER BY substr(sel,2), doc_id) AS BIGINT) AS pos,
         |  kept_segs, total_segs
         |FROM sh ORDER BY shard, pos""".stripMargin,
    // BPE round-1 pair statistics: same weighted adjacent-pair count
    // over the word relation (substr is character-based in both
    // engines; the corpus is BMP-only)
    "q_bpe_merges" ->
      """WITH w AS (SELECT w, count(*) AS wc FROM (
        |       SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |     WHERE w <> '' GROUP BY 1),
        |p AS (SELECT wc, substr(w, i, 2) AS pair
        |      FROM w, unnest(generate_series(1, len(w) - 1)) AS u(i)
        |      WHERE len(w) >= 2)
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM p
        |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "q_bpe_encode" -> bpeEncodeOracle(256),
    "q_chunk_cdc" -> cdcOracle,
    // the same integerized Tukey fences from quantile_cont
    "q_outlier_iqr" ->
      """WITH s AS (SELECT source,
        |    CAST(quantile_cont(n_chars, 0.25) * 4 AS BIGINT) AS q1x4,
        |    CAST(quantile_cont(n_chars, 0.75) * 4 AS BIGINT) AS q3x4
        |  FROM documents GROUP BY source)
        |SELECT doc_id, d.source, n_chars,
        |  (n_chars * 4 < q1x4 * 10 - q3x4 * 6 OR
        |   n_chars * 4 > q3x4 * 10 - q1x4 * 6) AS is_outlier
        |FROM documents d JOIN s ON d.source = s.source
        |ORDER BY doc_id""".stripMargin,
    // ok/salvaged-id/md5 stated analytically: only a parser that
    // round-trips JSON escaping byte-exactly AND isolates the planted
    // truncations to their own rows can match
    "q_jsonl_ingest" ->
      """SELECT doc_id, (doc_id % 101 <> 0) AS ok,
        |  CASE WHEN doc_id % 101 <> 0 THEN md5(coalesce(text, ''))
        |       ELSE '' END AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // ok/md5 stated analytically over the augmented text: only a csv
    // writer/reader pair that round-trips quoting byte-exactly AND
    // isolates both corruption classes can match
    "q_csv_ingest" ->
      """SELECT doc_id,
        |  (doc_id % 101 <> 0 AND doc_id % 97 <> 0) AS ok,
        |  CASE WHEN doc_id % 101 <> 0 AND doc_id % 97 <> 0
        |       THEN md5(CASE WHEN doc_id % 11 = 0
        |                     THEN coalesce(text, '') || ' quoted "part" end'
        |                     ELSE coalesce(text, '') END)
        |       ELSE '' END AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // stage = the same fixed-point quality decile (bit-identical
    // doubles — q_quality_score pins the formula), md5 order within
    "q_curriculum_order" ->
      s"""WITH q AS (SELECT doc_id, ${TextStats.qualitySql("text")} AS qual,
         |            md5(CAST(doc_id AS VARCHAR)) AS sel FROM documents)
         |SELECT doc_id, CAST(floor(qual * 10) AS INT) AS stage,
         |  CAST(row_number() OVER (PARTITION BY floor(qual * 10)
         |         ORDER BY sel, doc_id) AS BIGINT) AS pos
         |FROM q ORDER BY stage, pos""".stripMargin,
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
    // hygiene funnel: the repaired+composed text AND the
    // accent-insensitive dedup key both stated analytically, then the
    // same keep-first window
    "q_hygiene_funnel" ->
      s"""WITH c AS (SELECT doc_id,
         |    substr(text, 1, 80) || CASE WHEN doc_id % 3 = 0
         |      THEN ' caf' || chr(233)
         |      ELSE ' ' || chr(233) || 'nd ok' END AS clean_text,
         |    substr(text, 1, 80) || CASE WHEN doc_id % 3 = 0
         |      THEN ' cafe' ELSE ' end ok' END AS folded
         |  FROM documents),
         |k AS (SELECT doc_id, clean_text,
         |        ${TextStats.normalizeSql("folded")} AS key FROM c),
         |r AS (SELECT doc_id, clean_text,
         |        row_number() OVER (PARTITION BY key ORDER BY doc_id) AS rn
         |      FROM k)
         |SELECT doc_id, clean_text FROM r WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,
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
    // v3 funnel: every stage's verified CTE mirror chained — normalize,
    // keep-first dedup, quality gate, exact 3-gram screen (integer
    // compare), all-pairs cross jaccard ≥ 0.8 (the LSH recall contract
    // pinned by q_dedup_minhash/q_decontaminate_neardup), boilerplate
    // retention gate, md5 shard/pos
    "q_curation_funnel3" ->
      (funnel3StagesCte + s""",
         |sh3 AS (SELECT doc_id, kept_segs, total_segs,
         |          md5(CAST(doc_id AS VARCHAR)) AS sel FROM g3)
         |SELECT doc_id,
         |  CAST(strpos('0123456789abcdef', substr(sel,1,1)) - 1 AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY substr(sel,1,1)
         |         ORDER BY substr(sel,2), doc_id) AS BIGINT) AS pos,
         |  kept_segs, total_segs
         |FROM sh3 ORDER BY shard, pos""".stripMargin),
    "q_funnel_provenance" ->
      (funnel3StagesCte + s"""
         |SELECT tr.doc_id,
         |  CASE WHEN tr.doc_id NOT IN (SELECT doc_id FROM dd) THEN 'dup'
         |       WHEN tr.doc_id NOT IN (SELECT doc_id FROM qg) THEN 'quality'
         |       WHEN tr.doc_id IN (SELECT doc_id FROM scr) THEN 'contaminated'
         |       WHEN tr.doc_id IN (SELECT doc_id FROM nd) THEN 'neardup'
         |       WHEN tr.doc_id NOT IN (SELECT doc_id FROM g3) THEN 'boilerplate'
         |       ELSE 'kept' END AS verdict
         |FROM tr ORDER BY doc_id""".stripMargin),
    // self-excision: same cut rule, the repeated-gram set (df ≥ 2 over
    // distinct docs) replacing the external benchmark
    "q_self_excise" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |cg AS (SELECT doc_id, i AS pos, array_to_string(toks[i : i + 7], ' ') AS g
        |       FROM d, unnest(CASE WHEN len(toks) >= 8 THEN generate_series(1, len(toks) - 7)
        |                           ELSE [] END) AS u(i)),
        |rep AS (SELECT g FROM (
        |          SELECT g, count(DISTINCT doc_id) AS df FROM cg GROUP BY 1) t
        |        WHERE df >= 2),
        |bad AS (SELECT doc_id, list(DISTINCT pos) AS bad_starts
        |        FROM cg JOIN rep USING (g) GROUP BY doc_id),
        |cleaned AS (
        |  SELECT d.doc_id,
        |    list_filter(d.toks, (t, p) ->
        |      len(list_filter(coalesce(b.bad_starts, []), x -> x >= p - 7 AND x <= p)) = 0) AS kept,
        |    len(d.toks) AS n_tok
        |  FROM d LEFT JOIN bad b USING (doc_id))
        |SELECT doc_id,
        |  coalesce(array_to_string(kept, ' '), '') AS clean_text,
        |  CAST(n_tok - len(kept) AS INT) AS n_removed
        |FROM cleaned ORDER BY doc_id""".stripMargin
  )
}
