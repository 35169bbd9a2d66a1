package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gzip ingestion: real-codec round trip, trailer-verified corruption
  * handling, the decompression-bomb guard, and the map-only plan
  * shape. */
class CompressedSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  test("gzip → gunzip round-trips bytes exactly") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    assert(Compressed.gunzip(Compressed.gzip(payload)).get.sameElements(payload))
    assert(Compressed.gunzip(Compressed.gzip(Array.emptyByteArray)).get.isEmpty)
  }

  test("a flipped byte is caught by CRC verification, not a crash") {
    val g = Compressed.gzip("some document text that is long enough".getBytes("UTF-8"))
    val bad = g.clone(); bad(12) = (bad(12) ^ 0xff).toByte
    assert(Compressed.gunzip(bad).isEmpty)
    assert(Compressed.gunzip("not gzip at all".getBytes("UTF-8")).isEmpty)
    assert(Compressed.gunzip(g.take(g.length - 4)).isEmpty) // truncated trailer
  }

  test("decompression bomb is refused at the inflate cap") {
    val bomb = Compressed.gzip(new Array[Byte](Compressed.MaxInflatedBytes + (1 << 20)))
    assert(bomb.length < (1 << 20)) // the point of a bomb: tiny on the wire
    assert(Compressed.gunzip(bomb).isEmpty)
  }

  test("gunzipMeta emits ok/error rows and a shuffle-free plan") {
    val df = Seq((1L, "hello world"), (2L, "second doc")).toDF("doc_id", "text")
      .withColumn("payload", Compressed.gzipPlantedCol($"text", $"doc_id", 2))
    val ds = Compressed.gunzipMeta(df, "doc_id", "payload")
    val rows = ds.collect().sortBy(_.doc_id)
    assert(rows(0).doc_id == 1L && rows(0).ok &&
      rows(0).n_bytes == "hello world".length)
    assert(!rows(1).ok && rows(1).n_bytes == 0L && rows(1).text_md5 == "")
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no Exchange in:\n$plan")
  }
}
