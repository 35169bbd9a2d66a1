package graft.ext

/** Deterministic, rule-pinned sentence segmentation (UAX #29 §SB-
  * informed, reduced to a fixed rule table so the engine and the
  * DuckDB oracle replay it bit-exactly — the same determinism-over-
  * linguistic-perfection contract as the other text operators).
  *
  * A whitespace token ENDS a sentence iff, after stripping trailing
  * CLOSERS (quotes/brackets — UAX #29 SB8a's close-punctuation class):
  *   - it ends with '!' or '?' (unambiguous terminals, SB4), or
  *   - it ends with '.' AND is not a listed abbreviation (SB.ATerm
  *     suppression list), not a single-letter initial ("J."), and not
  *     a bare enumeration number ("3.").
  * The final sentence needs no terminal (end-of-text closes it, SB2).
  *
  * All three rule tables are SHARED LITERALS: [[isSentenceEnd]] (the
  * Scala form consumed by the codegen'd
  * [[graft.functions.SentenceEnds]] expression) and [[isEndSql]] (the
  * DuckDB form) are generated from the same constants, so the split
  * cannot drift between engine and oracle.
  *
  * Token model: single-space separation (`split(text, " ")`), the
  * corpus-wide convention every text operator and oracle here pins.
  */
object Sentences {

  /** Close-punctuation stripped from a token's tail before the
    * terminal check (order irrelevant — stripped as a set). */
  val Closers: String = "\"')]}"

  /** ATerm suppressions: tokens ending in '.' that do not close a
    * sentence. Case-sensitive, matched AFTER closer stripping. */
  val Abbreviations: Seq[String] = Seq(
    "Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "St.", "vs.", "etc.",
    "e.g.", "i.e.", "Fig.", "No.", "Inc.", "Ltd.", "Jr.", "Sr.")

  private val AbbrevSet = Abbreviations.toSet

  /** The rule, Scala form — shared by the expression's interpreted
    * eval and its generated code. */
  def isSentenceEnd(tok: String): Boolean = {
    var e = tok.length
    while (e > 0 && Closers.indexOf(tok.charAt(e - 1)) >= 0) e -= 1
    if (e == 0) return false
    tok.charAt(e - 1) match {
      case '!' | '?' => true
      case '.' =>
        val stripped = tok.substring(0, e)
        !AbbrevSet.contains(stripped) &&
          !(e == 2 && isAsciiLetter(stripped.charAt(0))) &&
          !isDigitsDot(stripped)
      case _ => false
    }
  }

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def isDigitsDot(s: String): Boolean = {
    if (s.length < 2) return false
    var i = 0
    while (i < s.length - 1) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  /** The rule, DuckDB form, over the token expression `t` — generated
    * from the same literal tables. */
  def isEndSql(t: String): String = {
    // '' escapes the single quote inside a DuckDB string literal
    val closersLit = "'" + Closers.replace("'", "''") + "'"
    val abbrevList = Abbreviations.map(a => s"'$a'").mkString(", ")
    val st = s"rtrim($t, $closersLit)"
    s"""(length($st) > 0 AND (
       |  substr($st, length($st), 1) IN ('!', '?') OR (
       |    substr($st, length($st), 1) = '.'
       |    AND $st NOT IN ($abbrevList)
       |    AND NOT regexp_matches($st, '^[A-Za-z]\\.$$')
       |    AND NOT regexp_matches($st, '^[0-9]+\\.$$'))))""".stripMargin
  }
}
