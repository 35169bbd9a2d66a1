package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic lexicon sentiment scorer — the engine's stand-in for the
  * reference pipeline's `CoreNLPProcessor` (56409-tika.xml:1171-1190).
  * The behavioral contract pinned by the template is only the label set
  * {POSITIVE, NEGATIVE, NEUTRAL} consumed by QueryRecord's routing SQL
  * (56409-tika.xml:1847-1859); the scoring model itself is ours and is
  * documented as such (SURVEY.md §7.5 risk 5).
  *
  * Tokens are split on single spaces and matched against fixed word
  * sets — semantics chosen to be expressible 1:1 in ANSI SQL for the
  * DuckDB oracle. Two implementations share the contract:
  * [[sentimentCol]] (pure Catalyst expressions — codegen'd, preferred in
  * queries) and [[label]] (plain Scala for the UDF/API surface).
  */
object Sentiment {
  val Positive = "POSITIVE"
  val Negative = "NEGATIVE"
  val Neutral  = "NEUTRAL"

  /** Kept small and balanced against the synthetic corpus vocabulary. */
  val PositiveWords: Seq[String] = Seq("fast", "small", "good", "great", "best")
  val NegativeWords: Seq[String] = Seq("slow", "big", "bad", "poor", "worst")

  /** Codegen column form: [[TokenSetCount]] keeps the word counting
    * inside whole-stage codegen (the higher-order `filter()` it
    * replaces evaluated its lambda interpreted — SURVEY.md §4.2). */
  def sentimentCol(text: Column): Column = {
    val p = TokenSetCount.token_set_count(text, PositiveWords)
    val n = TokenSetCount.token_set_count(text, NegativeWords)
    when(p > n, Positive).when(n > p, Negative).otherwise(Neutral)
  }

  /** Scala form — must stay semantically identical to [[sentimentCol]]. */
  def label(text: String): String = {
    if (text == null) return Neutral
    val toks = text.toLowerCase.split(" ", -1)
    var p = 0
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (PositiveWords.contains(toks(i))) p += 1
      else if (NegativeWords.contains(toks(i))) n += 1
      i += 1
    }
    if (p > n) Positive else if (n > p) Negative else Neutral
  }

  /** SQL fragment computing the same label in DuckDB (oracle side). */
  def duckdbExpr(textCol: String): String = {
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
    s"""CASE
       |  WHEN len(list_filter(string_split(lower($textCol), ' '), x -> x IN (${inList(PositiveWords)})))
       |     > len(list_filter(string_split(lower($textCol), ' '), x -> x IN (${inList(NegativeWords)})))
       |  THEN 'POSITIVE'
       |  WHEN len(list_filter(string_split(lower($textCol), ' '), x -> x IN (${inList(NegativeWords)})))
       |     > len(list_filter(string_split(lower($textCol), ' '), x -> x IN (${inList(PositiveWords)})))
       |  THEN 'NEGATIVE'
       |  ELSE 'NEUTRAL' END""".stripMargin
  }
}
