package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter membership screen: flag every candidate row whose key
  * MIGHT belong to a member set, without shuffling the candidates —
  * the semi-join pre-filter for cross-corpus overlap checks (has this
  * URL/document/fingerprint been seen in another crawl?) when the
  * member set is too big to broadcast exactly but its sketch is not.
  *
  * Scale shape: the filter is built in ONE distributed pass over the
  * member side (`DataFrameStatFunctions.bloomFilter` tree-aggregates
  * fixed-size bit arrays), and only the sketch — `-n·ln(fpp)/ln(2)²`
  * bits, e.g. ~1.2 GB for 10⁹ members at 1% fpp — reaches the driver
  * and ships back in the task closure. The candidate side is then a
  * narrow map: no shuffle, no join, at any corpus size. Downstream,
  * rows that survive the screen (a small fraction when overlap is
  * rare) proceed to the exact join; the sketch's one-sided error makes
  * that safe:
  *
  *   - NO false negatives, ever — a true member is always flagged.
  *     This is the contract `q_bloom_screen`'s oracle checks per row.
  *   - False positives at ≤ fpp — they cost exact-join work, never
  *     correctness.
  */
object Bloom {

  /** Member counts memoized per (semantically-equal) member plan: the
    * sizing count is a whole Spark job, and a screen invoked repeatedly
    * over the same member relation (the q_bloom_screen shape) re-paid
    * it every call. Keyed by the CANONICALIZED plan (not its 32-bit
    * semanticHash — a hash collision would silently size one screen
    * from another relation's count), and entries expire after
    * [[countTtlNanos]]: the count only SIZES the sketch, so staleness
    * never breaks the no-false-negative side, but a long-lived driver
    * screening a growing table from a frozen count would let fpp
    * degrade without bound — the TTL caps the degradation window at
    * whatever the table can grow in ten minutes, and the 10% headroom
    * covers that for any realistic ingest rate. */
  private val countTtlNanos = 10L * 60 * 1000 * 1000 * 1000
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def memberCount(members: DataFrame): Long = {
    val key = members.queryExecution.analyzed.canonicalized.toString
    val now = System.nanoTime()
    val hit = countCache.get(key)
    if (hit != null && now - hit._2 < countTtlNanos) hit._1
    else {
      val c = members.count()
      // evict on write so a driver screening many distinct relations
      // doesn't accumulate plan-string keys forever: drop everything
      // expired, then oldest entries down to a small bound
      val it = countCache.entrySet().iterator()
      while (it.hasNext) { if (now - it.next().getValue._2 >= countTtlNanos) it.remove() }
      while (countCache.size() >= 64) {
        var oldest: String = null; var oldestAt = Long.MaxValue
        countCache.forEach { (k, v) => if (v._2 < oldestAt) { oldest = k; oldestAt = v._2 } }
        if (oldest == null) return c else countCache.remove(oldest)
      }
      countCache.put(key, (c, now))
      c
    }
  }

  /** Adds `hitCol` (boolean) to `candidates`: true iff the long-typed
    * `keyCol` might be in `members`' key set. `expectedItems` sizes the
    * sketch — overestimate rather than under (an undersized filter
    * degrades fpp, never the no-false-negative side). Pass a
    * non-positive value (the default) to MEASURE the member count
    * first: one cheap count-only pass (the scan prunes to `keyCol`,
    * the aggregate is a single long, memoized per member plan)
    * guarantees the sketch is sized for the corpus actually screened —
    * a hardcoded guess that a 100 TB member set has outgrown silently
    * degrades fpp, turning the screen into a pass-through that pushes
    * all the work to the exact join. 10% headroom covers growth
    * between the count and the build on a live table.
    *
    * The per-candidate test is the codegen'd
    * [[graft.functions.BloomMightContain]] expression over the
    * serialized sketch bytes — no boxed UDF, no codegen fence on the
    * candidate scan. */
  def screenByLongKey(candidates: DataFrame, members: DataFrame, keyCol: String,
                      expectedItems: Long = -1L, fpp: Double = 0.01,
                      hitCol: String = "bloom_hit"): DataFrame = {
    val n = if (expectedItems > 0) expectedItems
            else math.max(64L, (memberCount(members) * 11L) / 10L)
    val bf = members.stat.bloomFilter(keyCol, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    candidates.withColumn(hitCol,
      graft.functions.BloomMightContain.bloom_might_contain(
        lit(bos.toByteArray), col(keyCol).cast("long")))
  }
}
