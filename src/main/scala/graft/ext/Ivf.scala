package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-
  * quantizer counterpart to [[Similarity.lshTopK]]: k-means-style
  * centroids partition the corpus into cells; a query scans only its
  * `nProbe` closest cells.
  *
  * Training is deterministic: centroids seed from evenly-spaced corpus
  * vectors (by id rank) and refine with a fixed number of Lloyd
  * iterations computed as DataFrame aggregations — the centroid set is
  * tiny and broadcasts; assignment is a narrow map. The 100 TB shape:
  * train on a sample, assign in one pass partitioned by cell id, store
  * cell id as a partition column so queries prune to nProbe cells at
  * the SCAN (partition pruning, not a post-filter).
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def nearest(vec: Seq[Float], n: Int): Array[Int] = {
      val scored = centroids.indices.map { c =>
        var d = 0.0
        val cent = centroids(c)
        var i = 0
        val len = math.min(cent.length, vec.length)
        while (i < len) { val diff = cent(i) - vec(i); d += diff * diff; i += 1 }
        (c, d)
      }
      scored.sortBy { case (c, d) => (d, c) }.take(n).map(_._1).toArray
    }
  }

  /** Deterministic training: seed = every (count/k)-th vector by id,
    * then `iters` Lloyd steps via groupBy-average. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            k: Int = 16, iters: Int = 3): Model = {
    val spark = emb.sparkSession
    val n = emb.count()
    val stride = math.max(n / k, 1)
    val seeds = emb
      .withColumn("_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(idCol))))
      .filter((col("_rank") - 1) % stride === 0)
      .limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var model = Model(seeds)
    var it = 0
    while (it < iters) {
      val assignU = assignUdf(model, 1)
      val means = emb
        .select(posexplode(col(vecCol)).as(Seq("dim", "v")),
          assignU(col(vecCol)).getItem(0).as("cell"))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("v")).as("m"))
        .collect()
      val next = model.centroids.map(_.clone())
      means.foreach { r =>
        val cell = r.getInt(0)
        if (cell >= 0 && cell < next.length) next(cell)(r.getInt(1)) = r.getDouble(2)
      }
      model = Model(next)
      it += 1
    }
    model
  }

  private def assignUdf(model: Model, nProbe: Int) =
    udf((vec: Seq[Float]) => model.nearest(vec, nProbe))

  /** ANN top-k through the inverted file: corpus assigned to its
    * nearest cell, queries probe their nProbe nearest cells. */
  def topK(emb: DataFrame, idCol: String, vecCol: String, queries: DataFrame,
           model: Model, k: Int = 5, nProbe: Int = 4): DataFrame = {
    val corpus = emb.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      assignUdf(model, 1)(col(vecCol)).getItem(0).as("cell"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      explode(assignUdf(model, nProbe)(col(vecCol))).as("cell"))
    val scored = corpus.join(broadcast(q), "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("score", Similarity.cosineCol(col("qvec"), col("nvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("score"), 4).as("score"))
  }
}
