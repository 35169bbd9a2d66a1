package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Timing methodology: each query materializes through the `noop` sink
  * — `count()` would let Catalyst drop the output sort and any column
  * not needed for counting, under-measuring the real plan. One warmup
  * query first absorbs JVM/codegen/parquet-reader initialization so
  * per-query numbers are comparable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Headline set: one representative per operator family (full
    // inventory runs under Verify; the all-pairs oracle-check forms
    // are excluded here in favor of their sub-quadratic scale paths).
    val headline = Seq(
      "q_agg_pricing", "q_join_revenue_by_nation", "q_window_topk_orders",
      "q_filter_topn", "q_rollup_lineitem", "q_events_json_props",
      "q_doc_pipeline", "q_route_good", "q_split_tokens",
      "q_extract_fixtures", "q_dedup_exact", "q_dedup_minhash",
      "q_dedup_simhash", "q_dedup_embed_lsh", "q_winnow_pairs",
      "q_knn_lsh", "q_knn_ivf",
      "q_token_stats", "q_fingerprint", "q_salted_agg",
      "q_sample_stratified", "q_vocab_topn", "q_contamination",
      "q_curation_funnel", "q_asof_join", "q_range_join", "q_tfidf_topk",
      "q_chunk_docs", "q_bloom_screen", "q_embed_quantize",
      "q_line_dedup", "q_self_excise",
      "q_multimodal_frames", "q_multimodal_decode", "q_skew_aqe_join",
      "q_stream_window", "q_sessionize")
      .filter(SparkEntry.queries.contains)

    // ≥3 timed iterations per query, report the MEDIAN (and min): this
    // host's throughput varies severalfold (SCALE.md), so a single run
    // can misreport a query by 20-40× in either direction.
    //
    // Iterations run ROUND-ROBIN across queries (round 1 of every query,
    // then round 2, …) rather than back-to-back per query: a sustained
    // host-contention window then shifts ONE sample of every query —
    // which the median discards — instead of swallowing all samples of
    // whichever query it happened to land on (BENCH_r04 reported
    // q_contamination at 82 s this way while an idle-host re-time
    // measured 2.3-2.8 s).
    //
    // A fixed constant-work sentinel is timed before every query slot;
    // if the sentinel's own spread (max/min) exceeds 3×, the run is
    // flagged "contended": true so the record is never silently wrong.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)

    // bit_xor, not sum: summing id * large-constant over 8M rows
    // overflows Long, which under Spark 4's default ANSI mode throws
    // ARITHMETIC_OVERFLOW (this killed BENCH_r05). xor does the same
    // constant per-row work with no overflow semantics.
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      try spark.range(0, 8L * 1000 * 1000, 1, cpus.toInt)
        .selectExpr("bit_xor(id * 2654435761) AS s")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    sentinel() // warm the sentinel plan itself so its first timing is comparable

    // Untimed warmup pass over the FULL headline set (JMH practice):
    // each query's first run pays whole-stage codegen compilation,
    // shuffle-file creation and JIT — one-time JVM costs a long-lived
    // cluster never re-pays per query. Timed iterations then measure
    // steady-state engine throughput (BENCH_r06's q_dedup_embed_lsh
    // median was 7.2 s with the cold run in-sample vs 1.8 s warm).
    for (name <- headline) try run(name) catch { case _: Throwable => }

    val samples =
      scala.collection.mutable.Map(headline.map(_ -> Vector.empty[Double]): _*)
    val sentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to iters; name <- headline) {
      sentinels += sentinel()
      // drop caches persisted inside operators (route fan-out, shingle
      // index) so queries don't inherit each other's memory pressure
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try run(name) catch { case _: Throwable => }
      samples.update(name, samples(name) :+ (System.nanoTime() - t0) / 1e9)
    }
    val results = headline.map { name =>
      val times = samples(name).sorted
      val n = times.length
      val median =
        if (n % 2 == 1) times(n / 2)
        else (times(n / 2 - 1) + times(n / 2)) / 2
      (name, median, times.head)
    }
    val sMin = sentinels.min
    val sMax = sentinels.max
    // Contention flag: a SUSTAINED slow window compromises medians; a
    // single blip among ~90 sentinel samples does not (the per-query
    // median already discards it). Flag on the sentinel MEDIAN — if
    // half the constant-work probes ran 3× slow, the host was busy for
    // most of the run and every median is suspect. (max/min flagged
    // r07's clean run — median≈min on every query — off one 0.38 s
    // probe out of 87 at 0.05-0.1 s.)
    val sP50 = sentinels.sorted.apply(sentinels.length / 2)
    val contended = sMin > 0 && sP50 / sMin > 3.0
    def obj(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(results.map(r => r._1 -> r._2))
    val qsMin = obj(results.map(r => r._1 -> r._3))
    val total = results.map(_._2).sum
    // Field order is deliberate: the bulky per-query maps print FIRST
    // and the verdict-bearing scalars (total/contended/sentinels) LAST,
    // so a tail-window capture that truncates the line eats per-query
    // detail, never the headline (BENCH_r07 lost its total this way).
    println(s"""{"metric":"total","queries":$qs,"queries_min":$qsMin,"sf":"$sfDir","iters":$iters,"sentinel_min":$sMin,"sentinel_p50":$sP50,"sentinel_max":$sMax,"contended":$contended,"unit":"sec","value":$total}""")
    spark.stop()
  }
}
