package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD '03 — the MOSS algorithm): rolling Rabin-Karp hashes over
  * character k-grams, keep the minimum hash in each sliding window of
  * `w` consecutive k-gram hashes (rightmost on ties). Guarantees any
  * shared substring of length ≥ w+k-1 contributes at least one shared
  * fingerprint — the standard local-similarity sketch, complementary
  * to MinHash's global-set view.
  *
  * Scale shape: narrow per-document UDF → explode to (doc, fp) rows →
  * the same inverted-index join machinery as shingles.
  */
object Winnowing {
  val K = 16 // k-gram length in chars (~3 words of this corpus — short
             // k-grams over a small vocabulary collide across unrelated
             // docs and blow up the pair join: measured 66 s → 4 s)
  val W = 8  // window: guarantee detection at ≥ 23 shared chars

  private val Base = 257L
  // Prime < 2^31 so every intermediate product provably fits in a Long:
  // h*Base ≤ 2^31·257 < 2^40 and char·pow ≤ 2^16·2^31 < 2^47. A wider
  // modulus would overflow on h*Base for h near Mod, silently making
  // the rolling hash PATH-dependent — which voids the winnowing
  // shared-substring guarantee.
  private val Mod = 2147483629L

  /** Sorted distinct winnowed fingerprints of a document. */
  private[ext] def fingerprints(text: String): Array[Long] = {
    if (text == null || text.length < K) return Array.empty
    val n = text.length - K + 1
    val hashes = new Array[Long](n)
    // rolling hash: h_i = h_{i-1}*B - c_{i-1}*B^K + c_{i+K-1}  (mod M)
    var pow = 1L
    var i = 0
    while (i < K - 1) { pow = pow * Base % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < K) { h = (h * Base + text.charAt(i)) % Mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = ((h - text.charAt(i - 1) * pow % Mod + Mod) % Mod * Base +
        text.charAt(i + K - 1)) % Mod
      hashes(i) = h
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + W <= n) {
      var minIdx = start
      var j = start + 1
      while (j < start + W) { // rightmost minimum
        if (hashes(j) <= hashes(minIdx)) minIdx = j
        j += 1
      }
      out.add(hashes(minIdx))
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  private val fpUdf = udf((text: String) => fingerprints(text))

  /** One row per (id, fingerprint). */
  def fingerprintRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(fpUdf(col(textCol))).as("fp"))

  /** Pairs ranked by shared-fingerprint overlap coefficient
    * |A∩B| / min(|A|,|B|) ≥ minOverlap. */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   minOverlap: Double = 0.5): DataFrame = {
    // No persist (was a cache leak — callers could never release it):
    // the self-join's two exchanges are canonically identical and
    // ReuseExchange computes the fingerprint shuffle once; `sizes`
    // recomputes the narrow fingerprint UDF, which at corpus scale is
    // cheaper than spilling a cached exploded relation.
    val fps = fingerprintRows(df, idCol, textCol)
    val sizes = fps.groupBy(col("id")).agg(count(lit(1)).as("n_fp"))
    val inter = fps.as("a")
      .join(fps.as("b"), col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("i") === col("sa.id"))
      .join(sizes.as("sb"), col("j") === col("sb.id"))
      .select(col("i"), col("j"),
        (col("c") / least(col("sa.n_fp"), col("sb.n_fp"))).as("overlap"))
      .filter(col("overlap") >= minOverlap)
      .select(col("i"), col("j"), round(col("overlap"), 4).as("overlap"))
  }
}
