package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** int8 quantization: range/rounding invariants, exactness on
  * representable inputs, reconstruction quality, and the no-shuffle
  * plan shape.
  */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("quantized values stay in [-127, 127] and max|v| maps to ±127") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(100) { i =>
      (i.toLong, Seq.fill(32)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Quantize.int8(df, "embedding")
      .select($"vec_id", $"qvec").as[(Long, Seq[Int])].collect()
    q.foreach { case (id, qv) =>
      assert(qv.forall(x => x >= -127 && x <= 127), s"vec $id out of range")
      assert(qv.exists(x => math.abs(x) == 127), s"vec $id max not saturated")
    }
  }

  test("exact on representable inputs; zero vector quantizes to zeros") {
    import spark.implicits._
    // v = k/127 quantizes back to exactly k
    val ks = Seq(-127, -64, -1, 0, 1, 63, 127)
    val df = Seq((1L, ks.map(k => (k / 127.0).toFloat)),
      (2L, Seq.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val out = Quantize.int8(df, "embedding")
      .select($"vec_id", $"qvec", $"scale").as[(Long, Seq[Int], Double)]
      .collect().sortBy(_._1)
    // float(k/127) * (127/maxabs-as-double) lands within 1e-6 of k —
    // the +0.5 floor absorbs it
    assert(out(0)._2 == ks, s"got ${out(0)._2}")
    assert(out(1)._2 == Seq(0, 0, 0, 0) && out(1)._3 == 0.0)
  }

  test("reconstruction cosine ≥ 0.999 on random unit-scale vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq.tabulate(200) { i =>
      (i.toLong, Seq.fill(64)((rnd.nextGaussian() * 0.2).toFloat))
    }.toDF("vec_id", "embedding")
    val bad = Quantize.int8(df, "embedding")
      .select(Quantize.reconCosine("embedding", "qvec").as("cos"))
      .filter($"cos" < 0.999).count()
    assert(bad == 0)
  }

  test("quantization plans with no shuffle") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Quantize.int8(emb, "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
