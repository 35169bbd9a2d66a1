package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asof join is inclusive at equal times and null before any right row") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("tag", "asof_v").collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("a") == 100.0) // equal time matches (inclusive)
    assert(out("b") == 150.0) // latest at-or-before wins
    assert(out("c") == null)  // before any right row → left-join null
    assert(out("d") == null)  // other key, no right rows
  }

  test("asof join plan has exactly one exchange (single shuffle on the key)") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val plan = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val fact = Seq.tabulate(100)(i => (s"k${i % 3}", i.toLong)).toDF("key", "x")
    val dim = Seq(("k0", "A"), ("k1", "B"), ("k2", "C")).toDF("key", "attr")
    val salted = Skew.saltedJoin(fact, dim, "key", saltBuckets = 8)
      .select("key", "x", "attr").collect().map(_.toString).sorted
    val plain = fact.join(dim, "key")
      .select("key", "x", "attr").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }
}
