package graft.ext

/** Deterministic 64-bit hashing primitives shared by the dedup and
  * similarity operators. FNV-1a for strings (public-domain constant
  * spec) and the splitmix64 finalizer (Steele et al., public domain)
  * for seed mixing — chosen over `String.hashCode` for 64-bit spread
  * and over Spark's internal hashers so the semantics are pinned by
  * this file alone.
  */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= FnvPrime
      i += 1
    }
    h
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Stable double in [-1, 1) from a seed — used for LSH hyperplanes. */
  def unitDouble(seed: Long): Double =
    (splitmix64(seed) >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
}
