package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * algebra (whole-stage codegen, pushdown-friendly) with semantics
  * chosen to be reproducible 1:1 in ANSI SQL for the DuckDB oracle —
  * each `*Sql` mirror must stay in lockstep with its column form.
  */
object TextStats {

  // language-ID stopword sets (tiny on purpose: heuristic, documented)
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "y", "es", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"))

  /** Codegen'd stopword counting (see [[graft.functions.TokenSetCount]]
    * — the higher-order `filter()` form it replaces broke whole-stage
    * codegen on the hot per-record path). */
  private def stopCount(text: Column, words: Seq[String]): Column =
    graft.functions.TokenSetCount.token_set_count(text, words)

  /** Predicted language: argmax stopword hits, ties to the earlier set,
    * 'unknown' when nothing matches. */
  def langIdCol(text: Column): Column = {
    val counts = Stopwords.map { case (lang, ws) => lang -> stopCount(text, ws) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("unknown"): Column) { case ((lang, c), acc) =>
      when(c === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  def langIdSql(textCol: String): String = {
    def cnt(ws: Seq[String]) =
      s"len(list_filter(string_split(lower($textCol), ' '), x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val exprs = Stopwords.map { case (lang, ws) => lang -> cnt(ws) }
    val best = exprs.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    exprs.foldRight("'unknown'") { case ((lang, c), acc) =>
      s"CASE WHEN $c = ($best) AND ($best) > 0 THEN '$lang' ELSE $acc END"
    }
  }

  /** Heuristic quality score in [0,1]: length saturation + stopword
    * presence + alpha ratio, equal thirds. The formula itself is the
    * contract (deterministic, documented), not a learned model. */
  // quality's terminal rounding is floor(x·10^4 + 0.5), NOT round():
  // rounding a double at a .xxxx5 tie is engine-specific (Spark
  // BigDecimal HALF_UP vs DuckDB's std round), and the score now
  // drives cross-engine DECISIONS (keep-best ordering, ensemble
  // gates) — floor/multiply/divide are bit-exact IEEE everywhere
  def qualityCol(text: Column): Column = qualityIntCol(text) / 1e4

  /** The same score as an EXACT fixed-point long (score·10^4) — the
    * form cross-engine ORDERING and banding should use: re-deriving
    * the integer from the double via ·1e4 is not exact for every
    * value, so consumers that band/compare take this directly. */
  def qualityIntCol(text: Column): Column = {
    val toks = split(text, " ")
    val nWords = size(toks)
    val lenScore = least(nWords.cast("double") / 50.0, lit(1.0))
    val stopScore = least(
      stopCount(text, Stopwords.flatMap(_._2)).cast("double") * 10.0
        / greatest(nWords, lit(1)).cast("double"), lit(1.0))
    val alphaRatio = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")
    floor((lenScore + stopScore + alphaRatio) / 3.0 * 1e4 + 0.5)
  }

  def qualitySql(textCol: String): String =
    s"(${qualityIntSql(textCol)}) / 1e4"

  def qualityIntSql(textCol: String): String = {
    val allStops = Stopwords.flatMap(_._2).map(w => s"'$w'").mkString(",")
    s"""floor((
       |  least(len(string_split($textCol, ' ')) / 50.0, 1.0) +
       |  least(len(list_filter(string_split(lower($textCol), ' '), x -> x IN ($allStops))) * 10.0
       |        / greatest(len(string_split($textCol, ' ')), 1), 1.0) +
       |  len(regexp_replace($textCol, '[^a-zA-Z]', '', 'g')) * 1.0 / greatest(len($textCol), 1)
       |) / 3.0 * 1e4 + 0.5)""".stripMargin
  }

  /** Non-empty whitespace token rows `(idCol, tok)` — THE shared
    * token-row derivation (mirror: `unnest(string_split(text, ' '))`
    * filtered of empties). Every token-relation consumer goes through
    * here so a future change to token semantics cannot leave one copy
    * behind and silently fork the engines' relations. */
  def tokenRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")

  /** Whitespace tokens and BPE-ish subword pieces (letter runs, digit
    * runs, single punctuation) — the two standard count bases. */
  def wsTokensCol(text: Column): Column = size(split(text, " "))
  def subwordPiecesCol(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  val SubwordRegexSql = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Content fingerprint: sha-256 hex (= DuckDB sha256). */
  def fingerprintCol(text: Column): Column = sha2(text, 256)

  /** Canonical text form for fuzzy-as-exact dedup: case-fold, map
    * punctuation to spaces, collapse runs, trim. Two documents that
    * differ only in casing/punctuation/spacing normalize to the same
    * string, so CANONICAL dedup is plain exact dedup downstream — the
    * standard trick that keeps "fuzzy" dedup map-only (no pairwise
    * comparison). Pure codegen'd column algebra; the regexes live in
    * the Java-regex ∩ RE2 subset so the oracle mirrors them verbatim. */
  def normalizeCol(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** DuckDB mirror of [[normalizeCol]] — interpolate into oracle SQL so
    * the two can't drift (the file's *Sql lockstep convention). */
  def normalizeSql(textCol: String): String =
    s"trim(regexp_replace(regexp_replace(lower($textCol), " +
      s"'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** The planted case/punctuation variant the canonical-dedup fixtures
    * inject (it must normalize back onto its original) — Scala and SQL
    * forms in lockstep like the other *Sql pairs; previously six
    * hand-copied sites. coalesce inside the plant: Spark concat
    * null-propagates while DuckDB concat skips NULLs. */
  def plantedVariantCol(text: Column): Column =
    concat(lit("  "), upper(coalesce(text, lit(""))), lit("!!"))

  def plantedVariantSql(textCol: String): String =
    s"concat('  ', upper(coalesce($textCol, '')), '!!')"
}
