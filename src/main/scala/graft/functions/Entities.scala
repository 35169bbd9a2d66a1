package graft.functions

/** Heuristic named-entity extraction — stand-in for the reference
  * pipeline's OpenNLP `NLPProcessor` (56409-tika.xml:1489-1512), which
  * consumes the `sentence` attribute and emits name/location attributes.
  * Pure-JVM capitalized-token heuristic (SURVEY.md §2.4 N1): runs of
  * capitalized words not at sentence start are candidate entities.
  */
object Entities {

  private val Token = java.util.regex.Pattern.compile(
    "\\b([A-Z][a-zA-Z]+(?:\\s+[A-Z][a-zA-Z]+)*)\\b")

  /** Candidate entities in order of first appearance, deduplicated. */
  def extract(sentence: String): Seq[String] = {
    if (sentence == null || sentence.isEmpty) return Seq.empty
    val out = scala.collection.mutable.LinkedHashSet[String]()
    val m = Token.matcher(sentence)
    while (m.find()) {
      val cand = m.group(1)
      // skip a single capitalized word at position 0 (sentence case)
      if (!(m.start == 0 && !cand.contains(' '))) out += cand
    }
    out.toSeq
  }
}
