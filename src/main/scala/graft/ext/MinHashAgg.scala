package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed aggregate (SURVEY.md §2.8: `Aggregator[IN,BUF,OUT]`
  * reserved for sketch extensions): element-wise-min union of MinHash
  * signatures. The union signature of a group of documents IS the
  * signature of the union of their shingle sets (min commutes with
  * set union), so one pass per group yields a constant-size sketch
  * from which cross-group Jaccard is estimated as the fraction of
  * agreeing lanes.
  *
  * The 100 TB shape: a full-corpus pairwise source comparison becomes
  * |groups|² over 64-long sketches after ONE aggregation shuffle —
  * the classic sketch-then-compare pattern.
  */
class MinHashUnion(n: Int) extends Aggregator[String, Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.fill(Dedup.NumHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], text: String): Array[Long] =
    mergeInto(buf, Dedup.signature(if (text == null) "" else text, n))

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = mergeInto(a, b)

  private def mergeInto(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {

  /** Column form usable in any groupBy().agg(...). */
  def minhash_union(textCol: Column, n: Int = 3): Column =
    udaf(new MinHashUnion(n)).apply(textCol)

  /** Estimated Jaccard between two signatures: agreeing-lane fraction. */
  private val estJaccard = udf((aSeq: Seq[Long], bSeq: Seq[Long]) => {
    // List-representation guard (see Ivf.Model.nearest)
    val a = aSeq.toArray
    val b = bSeq.toArray
    var eq = 0
    var i = 0
    val len = math.min(a.length, b.length)
    while (i < len) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / math.max(len, 1)
  })

  /** Pairwise estimated shingle-set Jaccard between groups: one
    * aggregation shuffle to |groups| sketches, then the tiny sketch
    * cross-join. */
  def groupSimilarity(df: DataFrame, groupCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    val sigs = df.groupBy(col(groupCol))
      .agg(minhash_union(col(textCol), n).as("sig"))
    sigs.as("a")
      .join(sigs.as("b"), col(s"a.$groupCol") < col(s"b.$groupCol"))
      .select(col(s"a.$groupCol").as("g1"), col(s"b.$groupCol").as("g2"),
        round(estJaccard(col("a.sig"), col("b.sig")), 4).as("est_jaccard"))
  }
}
