package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): embedding-space
  * deduplication that catches SEMANTIC duplicates exact/minhash text
  * dedup cannot see. The published recipe: k-means the (normalized)
  * embeddings, then inside each cluster drop every member whose cosine
  * to another member exceeds τ, keeping one representative per
  * semantic-duplicate group (here: the lowest id, the repo's canonical
  * tie-break).
  *
  * Built from the parts this engine already trusts: the deterministic
  * driver-sample Lloyd trainer ([[Ivf.train]] — bounded O(sample·k·dim)
  * driver work regardless of corpus size) and the codegen'd
  * [[graft.functions.DotProduct]] via [[Similarity.dotUdf]]. Vectors
  * are L2-normalized BEFORE clustering, so scaling noise cannot split a
  * duplicate pair across cells and the within-cell dot product IS the
  * cosine.
  *
  * Scale shape: one shuffle of (id, unit-vector) rows on the cell key;
  * the quadratic is confined within cells — Σ|cell|² is the SemDeDup
  * cost knob, controlled by k (at 100 TB raise k so cells stay
  * executor-sized; the paper runs 50k clusters over 5B embeddings).
  * The centroid model is k·dim doubles broadcast in a udf closure —
  * bounded metadata, like the IVF serving path. */
object SemDedup {

  /** The paper's cell-sizing discipline made explicit (Abbas et al.
    * run 50k clusters over 5B embeddings ≈ 100k per cell — k GROWS
    * with n): choose k so the EXPECTED cell size stays
    * ~`targetCellSize`, making the within-cell pairwise term
    * Σ|cell|² ≈ n·targetCellSize — LINEAR in n — where a fixed k
    * degrades to n²/k (the one superlinear curve the sf1→sf10 ladder
    * measured: 12.0× per decade at pinned k=16, SCALE.md). Floor 16 =
    * the operator default, so small corpora behave identically. */
  def kFor(n: Long, targetCellSize: Long): Int = {
    require(targetCellSize > 0, s"targetCellSize must be > 0: $targetCellSize")
    math.max(16L, (n + targetCellSize - 1) / targetCellSize).toInt
  }

  /** [[semDedup]] with k auto-scaled by [[kFor]] — the shape to copy
    * at corpus scale. Costs ONE extra count scan of the id column to
    * size k; the count is a number, not data, on the driver. (The
    * driver-side Lloyd trainer is O(sample·k·dim) per iteration with
    * sample ≥ k — at extreme k move training to a distributed k-means,
    * the assignment/compare stages are unchanged.) */
  def semDedupAuto(emb: DataFrame, idCol: String, vecCol: String,
                   tau: Double, targetCellSize: Long = 512,
                   iters: Int = 3): DataFrame =
    semDedup(emb, idCol, vecCol, tau,
      k = kFor(emb.select(col(idCol)).count(), targetCellSize), iters = iters)

  /** Flat nearest-centroid above this k pays more in assignment than
    * the cells save in comparison — switch to two-level. */
  private val TwoLevelK = 64

  /** The per-vector cell-assignment function: flat O(k·d) nearest for
    * small k; TWO-LEVEL (coarse-quantized) for k > [[TwoLevelK]] — the
    * centroids themselves are clustered into ⌈√k⌉ groups (one driver
    * Lloyd over the k centroid points, bounded metadata) and a vector
    * probes only its nearest group's members: O((√k + k/√k)·d) ≈
    * O(2√k·d) per row. Without this, assignment is O(n·k·d) =
    * O(n²·d / targetCellSize) at auto-scaled k and silently re-becomes
    * the quadratic auto-k exists to kill (measured at sf10: flat
    * assignment at k=469 ate the entire pairwise saving — 27.9 s vs
    * fixed-k's 29.5). Group-boundary assignments become approximate,
    * which SemDeDup tolerates BY DESIGN: cells only decide which pairs
    * are COMPARED (the published recipe's k-means is itself an
    * approximation), and a duplicate pair's identical unit vectors
    * co-assign under any deterministic function, so planted contracts
    * and the dedup guarantee for exact semantic duplicates are
    * unaffected. */
  private def assignFn(model: Ivf.Model): Seq[Double] => Int = {
    val k = model.centroids.length
    if (k <= TwoLevelK) { (vec: Seq[Double]) => model.nearest(vec, 1)(0) }
    else {
      val g = math.max(1, math.round(math.sqrt(k.toDouble)).toInt)
      val coarse = Ivf.lloyd(model.centroids.map(_.clone()), g, 3)
      val byGroup = Array.fill(g)(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      model.centroids.indices.foreach { ci =>
        byGroup(coarse.nearest(model.centroids(ci).toSeq, 1)(0)) += ci
      }
      // only non-empty groups are probe targets (a coarse center can
      // end up with zero members; probing it would have no answer)
      val live = byGroup.zipWithIndex.filter(_._1.nonEmpty)
      val liveCenters = Ivf.Model(live.map { case (_, gi) => coarse.centroids(gi) })
      val liveMembers: Array[Array[Int]] = live.map(_._1.toArray)
      (vecSeq: Seq[Double]) => {
        val vec = vecSeq.toArray // List-representation guard (Ivf.Model.nearest)
        val mem = liveMembers(liveCenters.nearest(vec, 1)(0))
        var best = mem(0)
        var bestD = Double.MaxValue
        mem.foreach { ci =>
          val cent = model.centroids(ci)
          var d = 0.0
          var i = 0
          val len = math.min(cent.length, vec.length)
          while (i < len) { val df = cent(i) - vec(i); d += df * df; i += 1 }
          if (d < bestD || (d == bestD && ci < best)) { bestD = d; best = ci }
        }
        best
      }
    }
  }

  /** (id, cell, kept) for every input vector. `kept=false` iff some
    * same-cell member with a smaller id sits within cosine ≥ τ. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               tau: Double, k: Int = 16, iters: Int = 3): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    val unit = emb
      .select(col(idCol).as("id"), vd.as("v0"))
      .withColumn("n2", aggregate(col("v0"), lit(0.0), (a, x) => a + x * x))
      .select(col("id"),
        transform(col("v0"), x => x / sqrt(col("n2"))).as("v"))
    val model = Ivf.train(unit, "id", "v", k, iters)
    val assign = udf(assignFn(model))
    // PERSIST the assigned relation: it feeds BOTH pair sides and the
    // final join-back, and assignment is O(√k·dim) per row — unpersisted
    // it re-runs three times. CacheScope loan pattern: released at the
    // caller's scope exit.
    val cells = CacheScope.register(
      unit.withColumn("cell", assign(col("v"))).persist())
    val a = cells.select(col("cell"), col("id").as("i"), col("v").as("va"))
    val b = cells.select(col("cell"), col("id").as("j"), col("v").as("vb"))
    // SHUFFLED HASH, pinned in the auto-scaled-k regime: there the
    // join key is a HIGH-cardinality cell id with the build side
    // bounded per key by the target cell size, so a per-partition hash
    // table streams the probe side with no sort and no spill. Left to
    // AQE the strategy flips between hash and sort-merge run to run
    // (stats sit near the boundary once `cells` is cached), and the
    // SMJ mode buffers whole cells per key through spilling
    // ExternalAppendOnlyUnsafeRowArrays — measured 13 s vs 58 s
    // BIMODAL on the same sf10 input; pinning removes the coin flip.
    // At SMALL fixed k the trade inverts (few giant keys leave
    // partitions idle and per-key bucket chains huge — measured 75 s
    // pinned vs 33 s under AQE's choice at sf10's misconfigured
    // k=16), so the fixed-k path keeps AQE's judgment.
    val aSide = if (k > TwoLevelK) a.hint("shuffle_hash") else a
    val dropped = aSide.join(b, Seq("cell"))
      .filter(col("i") < col("j"))
      .filter(Similarity.dotUdf(col("va"), col("vb")) >= tau)
      .select(col("j").as("id")).distinct()
    cells
      .join(dropped.withColumn("d", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell").cast("int").as("cell"),
        coalesce(col("d"), lit(false)).as("dropped"))
      .withColumn("kept", !col("dropped"))
      .drop("dropped")
  }
}
