package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup contracts: scale-invariant duplicate collapse, lowest-id
  * representative, separated directions untouched, partition
  * independence.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  // one duplicate trio along e1 (three different scales), plus three
  // isolated orthogonal-ish directions — cos(dup, dup) = 1, all other
  // pairs ≤ ~0.1
  private def vecs = Seq(
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(2f, 0f, 0f, 0f)),   // ×2 scale of id 1
    (3L, Seq(0.5f, 0f, 0f, 0f)), // ×0.5 scale of id 1
    (10L, Seq(0f, 1f, 0f, 0f)),
    (11L, Seq(0f, 0f, 1f, 0f)),
    (12L, Seq(0.1f, 0f, 0f, 1f))
  ).toDF("vec_id", "embedding")

  test("duplicate directions collapse to the lowest id; others survive") {
    val out = SemDedup.semDedup(vecs, "vec_id", "embedding", 0.9, k = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L))                     // representative
    assert(!out(2L) && !out(3L))        // scaled clones dropped
    assert(out(10L) && out(11L) && out(12L))
  }

  test("verdicts are partition-independent") {
    val a = SemDedup.semDedup(vecs, "vec_id", "embedding", 0.9, k = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    val b = SemDedup.semDedup(vecs.repartition(5), "vec_id", "embedding", 0.9, k = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(a.sameElements(b))
  }

  test("tau = 1-epsilon still catches exact-direction dups only") {
    val out = SemDedup.semDedup(vecs, "vec_id", "embedding", 0.999999, k = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && !out(2L) && !out(3L))
    assert(out(10L) && out(11L) && out(12L))
  }
}
