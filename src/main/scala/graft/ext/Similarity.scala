package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Two paths, per the scale story:
  *  - [[bruteForceTopK]]: broadcast the (small) query set, nested-loop
  *    against the corpus — exact, shuffle-free, linear in corpus size.
  *    The baseline and the verifier for the ANN path.
  *  - [[lshTopK]]: random-hyperplane LSH — each vector signs against
  *    `planes` fixed hyperplanes → bucket id; candidates share a
  *    bucket, so the scan shrinks to the bucket's postings. Recall is
  *    tunable via `planes` (fewer planes → bigger buckets → higher
  *    recall, more compute). The 100 TB shape: bucket id is a
  *    partition key; per-bucket top-k is a partial aggregate.
  *
  * Cosine is computed in pure column algebra (zip_with + aggregate) —
  * codegen-compatible, no UDF on the hot path.
  */
object Similarity {

  /** cosine(a, b) for two array<float> columns, in double precision.
    * Declarative form — kept for one-off use; the pairwise operators
    * below precompute norms and use [[graft.functions.DotProduct]]
    * instead: higher-order
    * array functions are interpreted (not codegen'd) and allocate per
    * call, which at N² pairs dominates the runtime (measured 100 s →
    * ~3 s on 2M pairs at sf0.1). */
  def cosineCol(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    val da = d(a); val db = d(b)
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(da, db) / sqrt(dot(da, da) * dot(db, db))
  }

  /** Codegen'd primitive-loop dot product (graft.functions.DotProduct):
    * same left-to-right double summation as the declarative form (and
    * DuckDB's list_cosine_similarity), so results are bit-identical —
    * without per-pair Seq boxing or a whole-stage-codegen fence. The
    * per-pair similarity loop is the engine's hottest scalar; see the
    * expression's scaladoc. */
  private[ext] def dotUdf(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotCol(a, b)

  /** (id, v: array<double>, n2: ‖v‖²) — norms computed once per vector,
    * not once per pair. */
  private[ext] def prepared(df: DataFrame, idCol: String, vecCol: String,
                       idAs: String, vecAs: String, n2As: String): DataFrame =
    df.select(col(idCol).as(idAs),
        transform(col(vecCol), x => x.cast("double")).as(vecAs))
      .withColumn(n2As, dotUdf(col(vecAs), col(vecAs)))

  /** Exact top-k neighbors for each query vector (id < queryMax here;
    * any small query DataFrame works the same way). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, k: Int = 5): DataFrame = {
    val para = emb.sparkSession.sparkContext.defaultParallelism
    val corpus = prepared(emb, idCol, vecCol, "nid", "nvec", "nn2").repartition(para)
    val q = prepared(queries, idCol, vecCol, "qid", "qvec", "qn2")
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("score",
        dotUdf(col("qvec"), col("nvec")) / sqrt(col("qn2") * col("nn2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 4).as("score"))
  }

  /** Contrastive-pair mining for embedding-model training data: for
    * each query vector, the top same-label neighbor (the positive) and
    * the top different-label neighbor (the HARD negative — the
    * near-miss that actually teaches the model, vs a random negative).
    *
    * Scale shape: the bounded query set broadcasts (the documented
    * top-k serving shape); each (query, branch) argmax runs as a
    * partial aggregate — max over a (cos, −id) struct — so only
    * |queries| result rows ever shuffle, with NO window over the pair
    * stream. Ties break to the smallest neighbor id. */
  def hardPairs(emb: DataFrame, idCol: String, vecCol: String,
                labelCol: String, queries: DataFrame): DataFrame = {
    val para = emb.sparkSession.sparkContext.defaultParallelism
    def prep(df: DataFrame, p: String) = df
      .select(col(idCol).as(s"${p}id"),
        transform(col(vecCol), x => x.cast("double")).as(s"${p}vec"),
        col(labelCol).as(s"${p}label"))
      .withColumn(s"${p}n2", dotUdf(col(s"${p}vec"), col(s"${p}vec")))
    val corpus = prep(emb, "n").repartition(para)
    val q = prep(queries, "q")
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        dotUdf(col("qvec"), col("nvec")) / sqrt(col("qn2") * col("nn2")))
    scored.groupBy(col("qid"), col("qlabel"))
      .agg(
        max(when(col("nlabel") === col("qlabel"),
          struct(col("cos").as("c"), (-col("nid")).as("ni")))).as("p"),
        max(when(col("nlabel") =!= col("qlabel"),
          struct(col("cos").as("c"), (-col("nid")).as("ni")))).as("n"))
      .select(col("qid"), col("qlabel").as("label"),
        // terminal cosines through the repo's floor display contract
        // (round() on a float-derived double is banned by the verify
        // discipline — only transcendental-derived values may round)
        (-col("p.ni")).as("pos_id"),
        (floor(col("p.c") * 1e4 + 0.5) / 1e4).as("pos_cos"),
        (-col("n.ni")).as("neg_id"),
        (floor(col("n.c") * 1e4 + 0.5) / 1e4).as("neg_cos"))
  }

  /** Per-executor cache of the deterministic hyperplane matrix: weights
    * derive from [[Hashing.unitDouble]] (reproducible with no stored
    * model), but hashing per multiply dominated signature cost at
    * planes×tables in the thousands — precompute once per
    * (planes, tables, dim) per JVM instead. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def hyperplanes(planes: Int, tables: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes, tables, dim), _ =>
      Array.tabulate(tables * planes) { tp =>
        val t = tp / planes
        val p = tp % planes
        Array.tabulate(dim)(i => Hashing.unitDouble((t.toLong * 64 + p) * 4096L + i))
      })

  /** Random-hyperplane signatures → one bucket id per hash table.
    * Multiple independent tables are the standard recall lever: a near
    * neighbor colliding in ANY table becomes a candidate. */
  private def bucketsUdf(planes: Int, tables: Int) = udf((vec: Seq[Double]) => {
    val mat = hyperplanes(planes, tables, vec.length)
    val v = vec.toArray
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        val plane = mat(t * planes + p)
        var dotv = 0.0
        var i = 0
        while (i < v.length) { dotv += v(i) * plane(i); i += 1 }
        if (dotv > 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  })

  /** ANN top-k: candidates share an LSH bucket in any of `tables`
    * hash tables. Candidate generation runs over compact (id, table,
    * bucket) relations; vectors re-join only for the surviving pairs —
    * the shape that keeps the 100 TB shuffle proportional to candidate
    * count, not corpus × tables × vector width. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, k: Int = 5, planes: Int = 4,
              tables: Int = 8): DataFrame = {
    val buckets = bucketsUdf(planes, tables)
    def bucketRows(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        posexplode(buckets(transform(col(vecCol), x => x.cast("double"))))
          .as(Seq("table", "bucket")))
    val corpusB = bucketRows(emb, "nid")
    val qB = bucketRows(queries, "qid")
    val candidates = corpusB.join(broadcast(qB), Seq("table", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    val scored = candidates
      .join(broadcast(prepared(queries, idCol, vecCol, "qid", "qvec", "qn2")), "qid")
      .join(prepared(emb, idCol, vecCol, "nid", "nvec", "nn2"), "nid")
      .withColumn("score",
        dotUdf(col("qvec"), col("nvec")) / sqrt(col("qn2") * col("nn2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 4).as("score"))
  }

  /** Per-query recall contract of an ANN result against the exact
    * top-k: emits `(qid, recall_ok)` where `recall_ok` ⇔ the ANN result
    * recovered at least ⌈k·minRecall⌉ of the true top-k neighbors. The
    * boolean (not the raw hit count) is the declared output because it
    * is what an oracle can state independently: hyperplanes/centroids
    * are deterministic here, so on a fixed corpus the booleans are
    * reproducible, and the DuckDB oracle asserts them all true. Driven
    * from the brute side so a query the ANN missed entirely still
    * surfaces as a (qid, false) row rather than disappearing. */
  def recallAtK(ann: DataFrame, brute: DataFrame, k: Int,
                minRecall: Double): DataFrame = {
    val needed = math.ceil(k * minRecall).toLong
    val hits = ann.select(col("qid"), col("nid"))
      .join(brute.select(col("qid"), col("nid")), Seq("qid", "nid"))
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    brute.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left_outer")
      .select(col("qid"),
        (coalesce(col("hits"), lit(0L)) >= needed).as("recall_ok"))
  }

  /** Sub-quadratic embedding near-duplicate pairs: LSH bucket
    * candidates + exact cosine verify — the scale path for the same
    * predicate as [[cosineNearDups]], mirroring the shape of
    * `Dedup.minhashNearDups` (bucket-join candidates over compact
    * (id, table, bucket) relations, exact verification only on
    * surviving candidates, vectors re-joined late).
    *
    * Recall math (random-hyperplane LSH): a pair at cosine c collides
    * per-plane with p = 1 - acos(c)/π, per-table with p^planes, in at
    * least one of `tables` tables with 1-(1-p^planes)^tables. The
    * candidate set scales as N^(1+ρ), ρ = ln(p_t)/ln(p_rand) — LSH
    * only prunes when the threshold is well above the random-cosine
    * noise floor. The defaults target genuine near-dup thresholds
    * (minCos ≥ 0.9): per pair at c = 0.9, p = 0.856, p_t = 0.856¹⁶ =
    * 0.084, miss across 128 tables = (1−0.084)¹²⁸ ≈ 1.4e-5; a RANDOM
    * pair (p ≈ 0.5) collides anywhere with ≈ 0.5¹⁶×128 ≈ 0.2 %, so the
    * candidate join touches ~1/500th of the N² pairs (ρ ≈ 0.23 →
    * N^1.23 overall). The hyperplanes are deterministic, so recall on
    * a given corpus is reproducible, not a per-run coin flip. At a
    * noise-floor threshold (e.g. cos ≥ 0.35 on random 64-dim vectors,
    * p_rand ≈ p_t) NO parameterization prunes — use [[cosineNearDups]]
    * there: brute force is the right algorithm for that regime.
    *
    * Scaling the exact-equality guarantee: expected misses ≈
    * n_pairs × (1−p_t)^tables grows linearly with the true-pair count,
    * so when the corpus grows ~10×, add ~⌈ln(10)/p_t⌉ ≈ 28 tables to
    * hold it constant (the spec pins equality vs the all-pairs oracle
    * on the test corpora).
    */
  /** The candidate half of [[lshNearDups]], exposed so specs can pin the
    * pruning ratio (|candidates| ≪ N²/2). */
  def lshCandidatePairs(emb: DataFrame, idCol: String, vecCol: String,
                        planes: Int, tables: Int): DataFrame = {
    val para = emb.sparkSession.sparkContext.defaultParallelism
    val buckets = bucketsUdf(planes, tables)
    // compact candidate relation: 8-byte id + table + bucket only
    val b = emb
      .select(col(idCol).as("id"),
        posexplode(buckets(transform(col(vecCol), x => x.cast("double"))))
          .as(Seq("table", "bucket")))
      .repartition(para, col("table"), col("bucket"))
    b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("i"), col("y.id").as("j")).distinct()
  }

  def lshNearDups(emb: DataFrame, idCol: String, vecCol: String,
                  minCos: Double, planes: Int = 16, tables: Int = 128): DataFrame = {
    val scored = lshCandidatePairs(emb, idCol, vecCol, planes, tables)
      .join(prepared(emb, idCol, vecCol, "i", "va", "na2"), "i")
      .join(prepared(emb, idCol, vecCol, "j", "vb", "nb2"), "j")
      .withColumn("cos", dotUdf(col("va"), col("vb")) / sqrt(col("na2") * col("nb2")))
      .filter(col("cos") >= minCos)
    scored.select(col("i"), col("j"), round(col("cos"), 4).as("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (id_i < id_j, cos ≥ minCos).
    * Brute-force all-pairs — the exact-oracle form; [[lshNearDups]]
    * is the scale path for the same predicate. */
  def cosineNearDups(emb: DataFrame, idCol: String, vecCol: String,
                     minCos: Double): DataFrame = {
    // The corpus parquet is often a single input split; the broadcast
    // nested-loop join parallelizes over STREAM-side partitions, so
    // spread the streamed side across the cluster before the N² loop.
    val para = emb.sparkSession.sparkContext.defaultParallelism
    val a = prepared(emb, idCol, vecCol, "i", "va", "na2").repartition(para)
    val b = prepared(emb, idCol, vecCol, "j", "vb", "nb2")
    a.crossJoin(b).filter(col("i") < col("j"))
      .withColumn("cos", dotUdf(col("va"), col("vb")) / sqrt(col("na2") * col("nb2")))
      .filter(col("cos") >= minCos)
      .select(col("i"), col("j"), round(col("cos"), 4).as("cos"))
  }
}
