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
    val assign = udf((vec: Seq[Double]) => model.nearest(vec, 1)(0))
    val cells = unit.withColumn("cell", assign(col("v")))
    val a = cells.select(col("cell"), col("id").as("i"), col("v").as("va"))
    val b = cells.select(col("cell"), col("id").as("j"), col("v").as("vb"))
    val dropped = a.join(b, Seq("cell"))
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
