package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Multi-pattern substring tagging with a BROADCAST Aho–Corasick
  * automaton (Aho & Corasick 1975, public) — the scale form of the
  * banned-term / topic-term tagging stage (UT1 keyword lists, DCLM's
  * banned-word filters): one pass over the text matches ALL patterns
  * simultaneously, O(|text| + matches), where a per-term regex pass
  * ([[Sampling.redact]]'s shape) degrades linearly in the pattern
  * count.
  *
  * Match semantics: every occurrence of every pattern counts,
  * including overlaps and patterns nested inside longer ones — the
  * dictionary-suffix links make `her` hit inside `hers`. That is
  * exactly per-pattern independent substring counting, so the oracle
  * can mirror each pattern with `(len(t) - len(replace(t, p, ''))) /
  * len(p)` and never needs the automaton.
  *
  * Scale shape: the automaton builds on the driver from the term list
  * (bounded model metadata — thousands of terms is kilobytes of
  * goto/fail tables), rides the UDF closure, and the scan is
  * map-only — no shuffle, no per-term pass. Matching is
  * case-sensitive on raw text; normalize upstream if needed.
  */
object KeywordTag {

  private def key(s: Int, c: Char): Long = (s.toLong << 16) | c

  /** Immutable matcher: flat goto map keyed by (state << 16 | char),
    * fail links, and per-state dictionary output pattern ids. */
  final class Automaton private[KeywordTag] (
      gotoMap: mutable.LongMap[Int],
      fail: Array[Int],
      outPatterns: Array[Array[Int]]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val nxt = gotoMap.getOrElse(key(s, c), -1)
        if (nxt >= 0) return nxt
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** Per-pattern occurrence counts over `text` (index-aligned with
      * the builder's pattern list). */
    def countAll(text: String, nPatterns: Int): Array[Long] = {
      val counts = new Array[Long](nPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val out = outPatterns(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the automaton (trie + BFS fail links + dictionary-suffix
    * output merging) from the pattern list. Driver-side, O(Σ|p|). */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    val gotoMap = mutable.LongMap.empty[Int]
    val fail = mutable.ArrayBuffer(0)
    val out = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    val children = mutable.Map.empty[Int, mutable.ArrayBuffer[(Char, Int)]]
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val k = key(s, c)
        gotoMap.get(k) match {
          case Some(nxt) => s = nxt
          case None =>
            val ns = fail.length
            gotoMap.put(k, ns)
            fail += 0
            out += mutable.ArrayBuffer.empty[Int]
            children.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += ((c, ns))
            s = ns
        }
      }
      out(s) += pi
    }
    // BFS: a child's fail link lands on the longest proper suffix that
    // is also a trie path; its dictionary outputs absorb that state's
    // (final by the time the child is processed — states only get
    // SHALLOWER fail targets, processed earlier in the BFS)
    val queue = mutable.Queue.empty[Int]
    children.getOrElse(0, mutable.ArrayBuffer.empty).foreach { case (_, c0) =>
      fail(c0) = 0; queue.enqueue(c0)
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      children.getOrElse(s, mutable.ArrayBuffer.empty).foreach { case (c, child) =>
        var f = fail(s)
        var fNext = -1
        while (fNext < 0) {
          fNext = gotoMap.getOrElse(key(f, c), -1)
          if (fNext < 0) {
            if (f == 0) fNext = 0 else f = fail(f)
          }
        }
        fail(child) = fNext
        out(child) ++= out(fNext)
        queue.enqueue(child)
      }
    }
    new Automaton(gotoMap, fail.toArray, out.map(_.toArray).toArray)
  }

  /** (idCol, n_hits, n_terms_hit, hit_counts) — per-document tag
    * counts for `patterns` over `textCol`. `hit_counts` is
    * index-aligned with `patterns` so the caller (and the oracle) can
    * name each term's count. Map-only; the automaton rides the UDF
    * closure. */
  def tagFrame(df: DataFrame, idCol: String, textCol: String,
               patterns: Seq[String]): DataFrame = {
    val auto = build(patterns)
    val n = patterns.length
    val countsUdf = udf { (t: String) =>
      auto.countAll(Option(t).getOrElse(""), n)
    }
    df.select(col(idCol), countsUdf(col(textCol)).as("hit_counts"))
      .select(col(idCol),
        aggregate(col("hit_counts"), lit(0L), (a, x) => a + x).as("n_hits"),
        size(filter(col("hit_counts"), x => x > 0)).as("n_terms_hit"),
        col("hit_counts"))
  }
}
