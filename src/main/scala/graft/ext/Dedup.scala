package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines —
  * the north-star extensions beyond the reference's own surface
  * (SURVEY.md §2.6 note): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the 100 TB story, per operator):
  *  - exact: one hash-partitioned shuffle on a 32-byte digest; no
  *    skew (digests are uniform), map-side projection only.
  *  - ngram Jaccard: inverted-index self-join on shingle — shuffle is
  *    proportional to Σ df(shingle)²; intended for candidate
  *    verification, not all-pairs at scale (that's MinHash's job).
  *  - MinHash+LSH: per-doc signature (narrow), explode to b band keys
  *    (b× row inflation, tiny rows), shuffle on band key, pairs only
  *    within buckets — the classic sub-quadratic near-dup path.
  *  - SimHash: 64-bit signature, pigeonhole join on 8-bit chunks
  *    (hamming ≤ 7 complete), distinct pairs, constant-time verify.
  */
object Dedup {

  /** Engine-stable 4-decimal rounding for cross-engine-compared doubles:
    * `floor(x·10⁴ + 0.5)/10⁴` is one IEEE expression with identical bits
    * in Spark and DuckDB; `round(x, 4)` ties at the 5th decimal round
    * engine-specifically (Spark HALF_UP on the decimal expansion, DuckDB
    * std rounding) — the repo-wide rule from the verify skill. */
  private def floor4(c: Column): Column = floor(c * lit(1e4) + lit(0.5)) / lit(1e4)

  // ---- exact ---------------------------------------------------------

  /** Exact dedup: keep the lowest id per content digest.
    * sha2-256 matches DuckDB's sha256 for the oracle. */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepOne(df, textCol, Seq(col(idCol).asc))

  /** Shared keep-one core: sha-256 fingerprint the key, keep the first
    * row of each group under `ordering` (which must be total — end it
    * with the id). Emits all input columns + `fp`; one shuffle. */
  private def keepOne(df: DataFrame, keyCol: String,
                      ordering: Seq[org.apache.spark.sql.Column]): DataFrame = {
    // emits all input columns + `fp` (and uses `rn` internally) — a
    // same-named input column would be silently overwritten
    require(!df.columns.contains("fp") && !df.columns.contains("rn"),
      "keep-one dedup emits 'fp' and uses 'rn'; rename those input columns first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(ordering: _*)
    df.withColumn("fp", sha2(col(keyCol), 256))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** [[exactKeepFirst]] with a QUALITY policy: within each duplicate
    * group (same `keyCol` value — pass a canonical/normalized column
    * for fuzzy-as-exact groups), keep the row with the HIGHEST
    * `scoreCol`, id ascending as the tie-break. The curation choice
    * when duplicates differ in their raw form (boilerplate, casing,
    * truncation): keep the best copy, not the earliest. Same single
    * sha-256 shuffle as keep-first. */
  def exactKeepBest(df: DataFrame, idCol: String, keyCol: String,
                    scoreCol: String): DataFrame =
    keepOne(df, keyCol, Seq(col(scoreCol).desc, col(idCol).asc))

  // ---- word n-gram shingles (shared) --------------------------------

  /** Distinct word n-gram shingles, one row per (id, shingle).
    * Pure column ops: split → slice/concat per position → explode.
    * Semantics identical to the relational tok-self-join form used in
    * the DuckDB oracle. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    rawShingleRows(df, idCol, textCol, n).distinct()

  /** Shingles before the distinct — positional duplicates included. */
  /** 1-based start positions of every n-gram of `toks` — THE positional
    * gram definition, shared by every shingle consumer (jaccard forms,
    * contamination screen and excision) so tokenization/windowing can
    * never silently diverge between them. */
  private[ext] def gramStartIdx(toks: Column, n: Int): Column =
    when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))

  /** The n-gram starting at 1-based position `i` of `toks`. */
  private[ext] def gramAt(toks: Column, i: Column, n: Int): Column =
    concat_ws(" ", slice(toks, i, lit(n)))

  private def rawShingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // the token array materializes BEFORE the gram transform slices
    // into it: HOF lambdas are interpreted, so gramAt over an inline
    // split() would re-tokenize the document per shingle — O(words²)
    // per row (the LinearGate.scoreFrame trap, measured 14× there)
    val toks = col("__toks")
    val shingles = transform(gramStartIdx(toks, n), i => gramAt(toks, i, n))
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), explode(shingles).as("s"))
  }

  /** Distinct (id, xxhash64(shingle)) — the join-ready hashed form.
    * Hashing BEFORE the distinct keeps the dedup exchange at 16 bytes
    * per row instead of the string form's variable-width shingles;
    * equivalent to `shingleRows + xxhash64` under the same
    * collisions-are-~0 contract as [[jaccardPairs]]. */
  def hashedShingleRows(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    rawShingleRows(df, idCol, textCol, n)
      .select(col("id"), xxhash64(col("s")).as("s"))
      .distinct()

  /** Distinct xxhash64 gram SET of a corpus — the id-free single-column
    * form consumed as a join/broadcast side (one distinct, no id
    * needed on the input). Same gram construction as every other
    * shingle consumer. */
  def hashedShingleSet(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val toks = col("__toks") // staged first — see rawShingleRows
    df.select(split(col(textCol), " ").as("__toks"))
      .select(explode(transform(gramStartIdx(toks, n),
        i => xxhash64(gramAt(toks, i, n)))).as("g"))
      .distinct()
  }

  /** All-pairs exact n-gram Jaccard ≥ minJ via inverted-index self-join.
    * The join key is xxhash64(shingle), not the string: identical join
    * semantics (collisions are ~0 at any realistic shingle count) with
    * a fixed-width comparable key — the self-join and its shuffle move
    * 8-byte longs instead of ~20-byte strings. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, minJ: Double = 0.8): DataFrame = {
    // No persist: the self-join's two sides are canonically identical
    // subplans, so ReuseExchange computes the shingle shuffle once; only
    // `sizes` recomputes the (narrow, cheap) shingling. Caching the
    // exploded shingle relation (~n× the corpus) would spill at scale
    // and leaked here before (callers could never unpersist).
    val sh = hashedShingleRows(df, idCol, textCol, n)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("i") === col("sa.id"))
      .join(sizes.as("sb"), col("j") === col("sb.id"))
      .select(col("i"), col("j"),
        (col("c") / (col("sa.n_sh") + col("sb.n_sh") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= minJ)
      .select(col("i"), col("j"), floor4(col("jaccard")).as("jaccard"))
  }

  /** Df-capped candidate form of [[jaccardPairs]] — the inverted-index
    * scale lever SCALE.md commits to: candidate pairs come only from
    * shingles with document frequency ≤ `dfCap`, then the FULL Jaccard
    * is recomputed over all shingles of each surviving pair. The
    * all-pairs self-join blows up as Σ df(shingle)²; boilerplate
    * shingles (navigation chrome, license headers) dominate that sum
    * while carrying no dedup signal — capping df bounds the join at
    * dfCap·Σdf and the verify join at |candidates|·shingles-per-doc.
    *
    * Recall semantics (deliberate, matched by the oracle): a pair is
    * found iff it shares at least one sub-cap shingle. A true near-dup
    * pair ALL of whose shared shingles are ≥dfCap-common is missed —
    * at minJ ≥ 0.8 such a pair is boilerplate by construction, the
    * standard stop-shingle trade. The gate stays hash-exact because
    * the DuckDB oracle applies the identical df rule independently. */
  def jaccardPairsDfCapped(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 3, minJ: Double = 0.8,
                           dfCap: Int = 20): DataFrame = {
    val sh = hashedShingleRows(df, idCol, textCol, n)
    val rare = sh.join(
      sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap).select(col("s")),
      Seq("s"))
    val candidates = rare.as("a")
      .join(rare.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = candidates
      .join(sh.as("sa"), col("i") === col("sa.id"))
      .join(sh.as("sb"), col("j") === col("sb.id") && col("sa.s") === col("sb.s"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("za"), col("i") === col("za.id"))
      .join(sizes.as("zb"), col("j") === col("zb.id"))
      .select(col("i"), col("j"),
        (col("c") / (col("za.n_sh") + col("zb.n_sh") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= minJ)
      .select(col("i"), col("j"), floor4(col("jaccard")).as("jaccard"))
  }

  // ---- MinHash + LSH -------------------------------------------------

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** Scala-side shingle set — MUST stay semantically identical to
    * [[shingleRows]]. */
  private[ext] def shingleSet(text: String, n: Int): Array[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) Array.empty
    else {
      val set = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder()
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
        set.add(sb.toString)
        i += 1
      }
      set.toArray(Array.empty[String])
    }
  }

  /** k-min-hash signature over the shingle set. */
  private[ext] def signature(text: String, n: Int): Array[Long] = {
    val sh = shingleSet(text, n)
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val base = Hashing.fnv1a64(sh(i))
      var k = 0
      while (k < NumHashes) {
        val h = Hashing.splitmix64(base ^ (k.toLong * 0x9e3779b97f4a7c15L))
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    sig
  }

  private val sigUdf = udf((text: String, n: Int) => signature(text, n))

  /** (id, band, bandKey) rows: b keys per doc. Docs with fewer than n
    * tokens have an empty shingle set → the identical all-MaxValue
    * signature; left in, every such doc collides in every band and the
    * candidate join grows a degenerate |short|² bucket whose pairs all
    * verify to jaccard 0.0 anyway. Filter them out up front — output is
    * unchanged (union=0 ⇒ jaccard 0.0 < any positive minJ). */
  def bandRows(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val bandKey = udf((sigSeq: Seq[Long], band: Int) => {
      val sig = sigSeq.toArray // List-representation guard (Ivf.Model.nearest)
      var h = Hashing.FnvOffset
      var r = 0
      while (r < RowsPerBand) {
        h = Hashing.splitmix64(h ^ sig(band * RowsPerBand + r))
        r += 1
      }
      h
    })
    df.filter(size(split(col(textCol), " ")) >= n)
      .select(col(idCol).as("id"), sigUdf(col(textCol), lit(n)).as("sig"))
      .select(col("id"), explode(sequence(lit(0), lit(Bands - 1))).as("band"), col("sig"))
      .select(col("id"), col("band"), bandKey(col("sig"), col("band")).as("key"))
  }

  /** Candidate pairs: ids sharing any LSH band bucket. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val bands = bandRows(df, idCol, textCol, n)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
  }

  /** Exact-Jaccard verify on two texts (candidates only — small). */
  private val pairJaccard = udf((ta: String, tb: String, n: Int) => {
    val a = shingleSet(ta, n)
    val b = shingleSet(tb, n)
    val sa = a.toSet
    var inter = 0
    val seen = scala.collection.mutable.HashSet[String]()
    var k = 0
    while (k < b.length) {
      if (sa.contains(b(k)) && seen.add(b(k))) inter += 1
      k += 1
    }
    val union = sa.size + b.toSet.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  })

  /** Exact-Jaccard verification of candidate `(i, j)` pairs against a
    * content store: joins the pair relation back to text by id (an
    * id-keyed lookup — at scale the corpus lives in the lake and only
    * surviving candidates fetch content) and keeps pairs at `minJ`.
    * Shared by the batch and streaming near-dup paths. */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, minJ: Double = 0.8): DataFrame = {
    val d = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    pairs
      .join(d.as("da"), col("i") === col("da.id"))
      .join(d.as("db"), col("j") === col("db.id"))
      .select(col("i"), col("j"), pairJaccard(col("da.t"), col("db.t"), lit(n)).as("jaccard"))
      .filter(col("jaccard") >= minJ)
      .select(col("i"), col("j"), floor4(col("jaccard")).as("jaccard"))
  }

  /** MinHash near-dup pairs, LSH candidates verified with exact
    * Jaccard: sub-quadratic candidate generation, exact output. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, minJ: Double = 0.8): DataFrame =
    verifyJaccard(minhashCandidates(df, idCol, textCol, n), df, idCol, textCol, n, minJ)

  /** CROSS-corpus MinHash near-dup matching — fuzzy train/benchmark
    * decontamination (the near-duplicate generalization of the exact
    * n-gram screen in [[Contamination.screen]]): band signatures on
    * BOTH corpora, candidate pairs from (band, key) collisions ACROSS
    * them, exact-Jaccard verify on the survivors. Output rows are
    * (train id `i`, benchmark id `j`, jaccard ≥ minJ) — the training
    * documents a leakage-hygiene pass would drop or flag.
    *
    * Scale shape: each corpus shuffles once on its compact
    * (id, band, 8-byte key) relation — text and signatures never
    * cross-join; the candidate join is key-bucketed on (band, key), so
    * cost is Σ per-bucket |train|×|bench|, sub-quadratic for any
    * non-degenerate signature distribution. The benchmark side is
    * usually tiny (a test set) — Spark's planner broadcasts its band
    * relation under AQE and the whole screen becomes map-side.
    * Caller contract: id spaces of the two corpora must be disjoint
    * (they share the content lookup inside [[verifyJaccard]]). */
  def minhashCrossNearDups(train: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String,
                           n: Int = 3, minJ: Double = 0.8): DataFrame = {
    val ta = bandRows(train, idCol, textCol, n)
    val tb = bandRows(bench, idCol, textCol, n)
    val cands = ta.as("a")
      .join(tb.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    verifyJaccard(cands, train.unionByName(bench), idCol, textCol, n, minJ)
  }

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash over token hashes weighted by term frequency.
    * Scala reference form; the hot path uses the codegen'd
    * [[graft.functions.SimHash64]] Catalyst expression (bit-identical —
    * asserted in TokenSetCountSpec/ExtOpsSpec lockstep tests). */
  private[ext] def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    val toks = text.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = Hashing.fnv1a64(toks(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Near-dup pairs with hamming(simhash) ≤ maxHamming (≤ 7 is complete
    * via the 8-chunk pigeonhole join; higher values may miss pairs). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 7): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      graft.functions.SimHash64.simhash64Col(col(textCol)).as("sim"))
    val chunked = sigs.select(col("id"), col("sim"),
        explode(sequence(lit(0), lit(7))).as("ci"))
      .withColumn("chunk", expr("shiftrightunsigned(sim, ci * 8)").bitwiseAND(lit(0xffL)))
    val pairs = chunked.as("a")
      .join(chunked.as("b"),
        col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.sim").as("sa"), col("b.sim").as("sb"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
  }

  // ---- cluster assignment (after pairwise dedup) ---------------------

  /** Connected components over near-dup pairs: every node gets the
    * MINIMUM id in its component as `cluster_id` — the canonical
    * document the group keeps. Iterative min-label propagation
    * (Pregel-style): each round joins current labels across the
    * symmetric edge set and takes the elementwise minimum, converging
    * in O(component diameter) rounds — near-dup clusters are shallow
    * (dup groups, not social graphs), so rounds stay single-digit at
    * any corpus size. Each round is one distributed join + aggregate;
    * the driver only sees the converged/changed COUNT (control plane,
    * like AQE), never the labels. Each round's result is
    * `localCheckpoint`ed: without lineage truncation the plan embeds
    * the previous round's plan twice and grows 2^rounds. `maxIters`
    * bounds the loop; hitting it raises rather than returning a
    * half-propagated labeling. */
  def clusterAssignments(nodes: DataFrame, idCol: String, pairs: DataFrame,
                         maxIters: Int = 20): DataFrame = {
    // checkpoint edges too: pairs usually carries an expensive lineage
    // (e.g. the jaccard shingle self-join) that would otherwise
    // recompute on every propagation round
    val edges = pairs.select(col("i"), col("j"))
      .union(pairs.select(col("j").as("i"), col("i").as("j")))
      .localCheckpoint(true)
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("lbl"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val prop = edges.join(labels, edges("j") === labels("id"))
        .groupBy(col("i")).agg(min(col("lbl")).as("nlbl"))
      val next = labels.as("l")
        .join(prop, col("l.id") === prop("i"), "left")
        .select(col("l.id").as("id"),
          least(col("l.lbl"), coalesce(col("nlbl"), col("l.lbl"))).as("lbl"))
        .localCheckpoint(true)
      converged = next.as("n").join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.lbl") =!= col("o.lbl")).isEmpty
      labels = next
      iter += 1
    }
    require(converged, s"clusterAssignments did not converge in $maxIters rounds")
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}
