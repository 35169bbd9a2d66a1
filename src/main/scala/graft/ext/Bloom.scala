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
    * it every call. Keyed by the canonicalized plan rendering AND its
    * semanticHash together — the rendering alone truncates long field
    * lists (`maxToStringFields`), the hash alone is a collidable 32
    * bits; colliding on both at once is not a realistic event. The
    * count is held LAZILY in the entry so concurrent first callers run
    * ONE job (`lazy val` synchronizes on the holder; the map op itself
    * stays short). Entries expire after [[countTtlNanos]]: staleness
    * never breaks the no-false-negative side (the count only SIZES the
    * sketch), but a long-lived driver screening a growing table from a
    * frozen count would let fpp degrade without bound — the TTL caps
    * the window, and the 10% headroom covers realistic ingest inside
    * it. Expired/oldest entries are dropped on access so plan-string
    * keys cannot accumulate forever. */
  private final class Counted(thunk: () => Long, val at: Long) {
    lazy val value: Long = thunk()
  }
  private val countTtlNanos = 10L * 60 * 1000 * 1000 * 1000
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, Counted]()

  private def evictStale(now: Long): Unit = {
    val it = countCache.entrySet().iterator()
    while (it.hasNext) if (now - it.next().getValue.at >= countTtlNanos) it.remove()
    var guard = countCache.size()
    while (countCache.size() > 64 && guard > 0) {
      var oldest: String = null
      var oldestAt = Long.MaxValue
      countCache.forEach { (k, v) => if (v.at < oldestAt) { oldest = k; oldestAt = v.at } }
      if (oldest != null) countCache.remove(oldest)
      guard -= 1
    }
  }

  private def memberCount(members: DataFrame): Long = {
    val plan = members.queryExecution.analyzed
    val key = s"${plan.semanticHash()}:${plan.canonicalized.toString}"
    val now = System.nanoTime()
    var e = countCache.computeIfAbsent(key,
      _ => new Counted(() => members.count(), now))
    if (now - e.at >= countTtlNanos) {
      val fresh = new Counted(() => members.count(), now)
      e = if (countCache.replace(key, e, fresh)) fresh
          else countCache.computeIfAbsent(key, _ => fresh)
    }
    evictStale(now)
    e.value
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
