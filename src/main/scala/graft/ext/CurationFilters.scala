package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rule-based document quality filters from the two published web-corpus
  * curation recipes every LLM pipeline starts from:
  *
  *  - the Gopher rules (Rae et al. 2021, "Scaling Language Models:
  *    Methods, Analysis & Insights from Training Gopher", Appendix A —
  *    word-count window, mean-word-length window, symbol-to-word ratio,
  *    bullet/ellipsis line fractions, alphabetic-word fraction, required
  *    stop-word hits), and
  *  - the C4 line-level filters (Raffel et al. 2020, "Exploring the
  *    Limits of Transfer Learning with a Unified Text-to-Text
  *    Transformer" §2.2 — keep only lines ending in terminal punctuation
  *    with ≥5 words, drop pages with <3 retained lines, drop pages
  *    containing "lorem ipsum" or a curly brace).
  *
  * Reference role analogue: the RouteOnContent/QueryRecord gate of the
  * flow (reference flow template 56409-tika.xml routes on extracted-text
  * predicates); these are the corpus-scale versions of that gate.
  *
  * Scale shape: both filters are pure per-row column algebra over
  * split/filter/aggregate higher-order functions — map-only, codegen'd,
  * no shuffle, no UDFs; at 100 TB they run at scan speed and combine
  * with pushdown. Every KEEP decision compares integers (cross-
  * multiplied fractions), never rounded doubles, so the gate cannot
  * flip on an engine-specific rounding boundary; the REPORTED ratio
  * columns use the repo's floor(x·1e4+0.5)/1e4 display contract.
  *
  * Each Column form has a *Sql mirror in DuckDB dialect (the file-wide
  * lockstep convention — see [[TextStats]]); the planted fixture texts
  * are shared literals so the two sides cannot drift.
  */
object CurationFilters {

  /** The Gopher "required words": a document must contain ≥2 of these. */
  val RequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  // ---- shared word/line primitives (Column side) --------------------

  private def wordsCol(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  private def linesCol(text: Column): Column =
    filter(split(text, "\n"), l => trim(l) =!= "")

  // ---- Gopher -------------------------------------------------------

  /** All Gopher rule measures + the keep verdict as one struct-free
    * projection; call via [[gopherFrame]] for the named columns.
    *
    * STAGED evaluation: higher-order functions are interpreted (no
    * whole-stage codegen), so an expression tree that mentions the
    * tokenized array N times re-tokenizes the document N times per
    * row. The word/line/lowercased arrays therefore materialize in
    * one projection, the integer counts in a second, and the ratio/
    * verdict algebra — all cheap attribute arithmetic — in the third
    * (CollapseProject declines to merge them back: it will not
    * duplicate expensive expressions). Same trap and fix as
    * [[LinearGate.scoreFrame]], measured there at 14×. */
  def gopherFrame(df: DataFrame, textCol: String): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val arrays = df.select(col("doc_id"), text.as("__t"),
        wordsCol(text).as("__ws"), linesCol(text).as("__ls"))
      .select(col("*"), transform(col("__ws"), w => lower(w)).as("__lw"))
    val t = col("__t"); val ws = col("__ws"); val ls = col("__ls")
    val stopHits = RequiredStops
      .map(s => when(array_contains(col("__lw"), s), 1).otherwise(0))
      .reduce(_ + _)
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEllOcc = (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
    val counts = arrays.select(
      col("doc_id"),
      size(ws).cast("long").as("__nw"),
      // Σ word length for the mean-word-length window [3, 10]
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).as("__cs"),
      size(filter(ws, w =>
        length(regexp_replace(w, "[^A-Za-z]", "")) > 0)).cast("long")
        .as("__nalpha"),
      stopHits.as("__stop"),
      (nHash + nEllOcc).cast("long").as("__nsym"),
      size(ls).cast("long").as("__nl"),
      size(filter(ls, l =>
        startswith(ltrim(l), lit("- ")) || startswith(ltrim(l), lit("* "))))
        .cast("long").as("__nbullet"),
      size(filter(ls, l => endswith(rtrim(l), lit("..."))))
        .cast("long").as("__nellline"))
    val nw = col("__nw"); val cs = col("__cs"); val nAlpha = col("__nalpha")
    val nSym = col("__nsym"); val nl = col("__nl")
    val nBullet = col("__nbullet"); val nEllLine = col("__nellline")
    val nwSafe = greatest(nw, lit(1L))
    val nlSafe = greatest(nl, lit(1L))
    def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
    val keep =
      (nw >= 50 && nw <= 100000) &&
        (cs >= nw * 3 && cs <= nw * 10) &&
        (nSym * 10 <= nw) &&
        (nBullet * 10 < nl * 9) &&
        (nEllLine * 10 < nl * 3) &&
        (nAlpha * 5 >= nw * 4) &&
        (col("__stop") >= 2)
    counts.select(
      col("doc_id"),
      nw.cast("int").as("n_words"),
      r4(cs.cast("double") / nwSafe).as("mean_wlen"),
      r4(nSym.cast("double") / nwSafe).as("symbol_ratio"),
      r4(nBullet.cast("double") / nlSafe).as("frac_bullet"),
      r4(nEllLine.cast("double") / nlSafe).as("frac_ellipsis"),
      r4(nAlpha.cast("double") / nwSafe).as("frac_alpha"),
      col("__stop").cast("int").as("stop_hits"),
      keep.as("keep"))
  }

  /** DuckDB mirror of [[gopherFrame]] over a relation exposing
    * (doc_id, text). `rel` is a CTE/view name. */
  def gopherSql(rel: String): String = {
    val stops = RequiredStops.map(s => s"'$s'").mkString(", ")
    s"""WITH g AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws,
       |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ls,
       |    len(text) - len(regexp_replace(text, '#', '', 'g')) AS n_hash,
       |    (len(text) - len(regexp_replace(text, '\\.\\.\\.', '', 'g'))) // 3 AS n_ell_occ
       |  FROM $rel),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(ws) AS BIGINT) AS nw,
       |    CAST(coalesce(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS cs,
       |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter([$stops], s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS BIGINT) AS stop_hits,
       |    CAST(n_hash + n_ell_occ AS BIGINT) AS n_sym,
       |    CAST(len(ls) AS BIGINT) AS nl,
       |    CAST(len(list_filter(ls, l -> starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* '))) AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS n_ell_line
       |  FROM g)
       |SELECT doc_id,
       |  CAST(nw AS INT) AS n_words,
       |  floor(cs * 1.0 / greatest(nw, 1) * 1e4 + 0.5) / 1e4 AS mean_wlen,
       |  floor(n_sym * 1.0 / greatest(nw, 1) * 1e4 + 0.5) / 1e4 AS symbol_ratio,
       |  floor(n_bullet * 1.0 / greatest(nl, 1) * 1e4 + 0.5) / 1e4 AS frac_bullet,
       |  floor(n_ell_line * 1.0 / greatest(nl, 1) * 1e4 + 0.5) / 1e4 AS frac_ellipsis,
       |  floor(n_alpha * 1.0 / greatest(nw, 1) * 1e4 + 0.5) / 1e4 AS frac_alpha,
       |  CAST(stop_hits AS INT) AS stop_hits,
       |  (nw BETWEEN 50 AND 100000) AND (cs BETWEEN nw * 3 AND nw * 10)
       |    AND (n_sym * 10 <= nw) AND (n_bullet * 10 < nl * 9)
       |    AND (n_ell_line * 10 < nl * 3) AND (n_alpha * 5 >= nw * 4)
       |    AND (stop_hits >= 2) AS keep
       |FROM m""".stripMargin
  }

  /** The STRUCTURAL subset of the Gopher rules (word-count window,
    * mean-word-length window, symbol ratio, alphabetic-word fraction)
    * as one gate predicate — what the composed funnel applies to the
    * synthetic corpus, where the stop-word and line-shape rules are
    * vacuous (single-line pages with no English function words) and
    * would empty the pipe. Same integer cross-multiplied comparisons
    * as [[gopherFrame]]. */
  def structuralKeepCol(text: Column): Column =
    structuralKeepFromTokens(wordsCol(text), text)

  /** [[structuralKeepCol]] over an ALREADY-MATERIALIZED token array —
    * for callers that stage the tokenization anyway ([[Attributes]]),
    * so the gate doesn't pay a second split of the same text. */
  def structuralKeepFromTokens(ws: Column, text: Column): Column = {
    // ONE aggregate pass over ONE tokenization: the word array is the
    // HOF's operand (evaluated once), the three counts fold together,
    // and the verdict computes in the finish lambda where `acc` is a
    // BOUND variable — the naive form mentioned the split four times
    // and, HOFs being interpreted, re-tokenized the row four times
    // (the LinearGate.scoreFrame trap, in predicate position where a
    // staged projection isn't available).
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    val nEllOcc = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val nSym = (nHash + nEllOcc).cast("long")
    aggregate(ws,
      struct(lit(0L).as("nw"), lit(0L).as("cs"), lit(0L).as("na")),
      (acc, w) => struct(
        (acc.getField("nw") + 1L).as("nw"),
        (acc.getField("cs") + length(w)).as("cs"),
        (acc.getField("na") +
          when(length(regexp_replace(w, "[^A-Za-z]", "")) > 0, 1L)
            .otherwise(0L)).as("na")),
      acc => {
        val nw = acc.getField("nw")
        val cs = acc.getField("cs")
        val na = acc.getField("na")
        (nw >= 50L && nw <= 100000L) &&
          (cs >= nw * 3 && cs <= nw * 10) &&
          (nSym * 10 <= nw) &&
          (na * 5 >= nw * 4)
      })
  }

  /** DuckDB mirror of [[structuralKeepCol]] (a WHERE-clause predicate
    * over `textCol`). */
  def structuralKeepSql(textCol: String): String =
    s"""(len(list_filter(string_split_regex($textCol, '\\s+'), w -> w <> ''))
       |   BETWEEN 50 AND 100000)
       | AND (CAST(coalesce(list_sum(list_transform(
       |        list_filter(string_split_regex($textCol, '\\s+'), w -> w <> ''),
       |        w -> len(w))), 0) AS BIGINT)
       |   BETWEEN len(list_filter(string_split_regex($textCol, '\\s+'), w -> w <> '')) * 3
       |       AND len(list_filter(string_split_regex($textCol, '\\s+'), w -> w <> '')) * 10)
       | AND ((len($textCol) - len(regexp_replace($textCol, '#', '', 'g'))
       |       + (len($textCol) - len(regexp_replace($textCol, '\\.\\.\\.', '', 'g'))) // 3) * 10
       |   <= len(list_filter(string_split_regex($textCol, '\\s+'), w -> w <> '')))
       | AND (len(list_filter(string_split_regex($textCol, '\\s+'),
       |        w -> regexp_matches(w, '[A-Za-z]'))) * 5
       |   >= len(list_filter(string_split_regex($textCol, '\\s+'), w -> w <> '')) * 4)""".stripMargin

  // ---- C4 -----------------------------------------------------------

  /** C4 line filter + page gate: lines ending in terminal punctuation
    * with ≥5 words survive; the page survives when ≥3 lines do and the
    * text contains neither "lorem ipsum" nor a curly brace. Emits the
    * md5 of the retained text so the cleaned payload is pinned without
    * hashing megabytes through the comparator. */
  def c4Frame(df: DataFrame, textCol: String): DataFrame = {
    // staged like gopherFrame: the retained-line array is an
    // interpreted HOF, so the naive form re-filtered (and re-split
    // every line of) the document once per reference — 3× for `kept`,
    // 4× for `ls`
    val text = coalesce(col(textCol), lit(""))
    val staged = df
      .select(col("doc_id"), text.as("__t"), linesCol(text).as("__ls"))
      .select(col("doc_id"), col("__t"), col("__ls"),
        filter(col("__ls"), l => {
          val t = rtrim(l)
          val last = substring(t, -1, 1)
          (last === "." || last === "!" || last === "?" || last === "\"") &&
            size(filter(split(l, "\\s+"), w => w =!= "")) >= 5
        }).as("__kept"))
    val hasLorem = contains(lower(col("__t")), lit("lorem ipsum"))
    val hasBrace = contains(col("__t"), lit("{"))
    val nKept = size(col("__kept"))
    staged.select(
      col("doc_id"),
      size(col("__ls")).as("n_lines"),
      nKept.as("n_kept"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (nKept >= 3 && !hasLorem && !hasBrace).as("keep"),
      md5(concat_ws("\n", col("__kept")).cast("binary")).as("cleaned_md5"))
  }

  /** DuckDB mirror of [[c4Frame]]. */
  def c4Sql(rel: String): String =
    s"""WITH g AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ls
       |  FROM $rel),
       |k AS (
       |  SELECT doc_id, text, ls,
       |    list_filter(ls, l ->
       |      list_contains(['.', '!', '?', '"'], right(rtrim(l), 1))
       |      AND len(list_filter(string_split_regex(l, '\\s+'), w -> w <> '')) >= 5) AS kept
       |  FROM g)
       |SELECT doc_id,
       |  CAST(len(ls) AS INT) AS n_lines,
       |  CAST(len(kept) AS INT) AS n_kept,
       |  contains(lower(text), 'lorem ipsum') AS has_lorem,
       |  contains(text, '{') AS has_brace,
       |  len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
       |    AND NOT contains(text, '{') AS keep,
       |  md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_md5
       |FROM k""".stripMargin

  // ---- planted fixtures ---------------------------------------------
  // The synthetic corpus is single-line unpunctuated prose, so several
  // rule branches (bullets, ellipses, terminal punctuation, lorem) never
  // fire on it. These planted pages exercise every branch; the SAME
  // Scala string literals feed both the Spark union and the oracle's
  // VALUES clause, so the fixture cannot drift between engines. IDs are
  // negative to stay disjoint from corpus doc_ids.

  private def rep(w: String, n: Int): String = Seq.fill(n)(w).mkString(" ")

  /** (doc_id, text) planted pages for the Gopher rule branches. */
  val gopherPlanted: Seq[(Long, String)] = Seq(
    // passes every rule: 55 well-formed words incl. required stops
    -1L -> (rep("the quick brown fox jumps over that lazy dog again and", 5) + " with more text here"),
    // word-count floor: 4 words
    -2L -> "the cat and dog",
    // mean word length > 10
    -3L -> rep("extraordinarily", 60),
    // symbol-to-word ratio > 0.1 (hashes)
    -4L -> (rep("the data and that value with more", 8) + " " + rep("#", 12)),
    // > 90% bullet lines
    -5L -> (Seq.fill(10)("- " + rep("the item and that note with detail", 2)).mkString("\n")),
    // > 30% ellipsis-terminated lines
    -6L -> (Seq.fill(4)(rep("the story trails off here and that", 2) + " ...").mkString("\n") +
      "\n" + rep("the plain line stays and that", 2)),
    // alphabetic-word fraction < 0.8 (word count still passes)
    -7L -> (rep("12345 67890", 25) + " the and"),
    // < 2 required stop words
    -8L -> rep("alpha beta gamma delta epsilon zeta", 10))

  /** (doc_id, text) planted pages for the C4 rule branches. */
  val c4Planted: Seq[(Long, String)] = Seq(
    // 3 good lines + 1 dropped (no terminal punctuation) -> keep
    -11L -> ("this first line carries five good words.\n" +
      "another line with enough words to pass!\n" +
      "does this question line also survive the gate?\n" +
      "a trailing line without punctuation"),
    // good lines but the page mentions lorem ipsum -> drop
    -12L -> ("this page looks fine at the line level.\n" +
      "every line here ends with punctuation marks.\n" +
      "but Lorem Ipsum filler text poisons the page."),
    // good lines but a brace appears -> drop
    -13L -> ("this page also looks fine at first.\n" +
      "yet a template artifact { remains embedded here.\n" +
      "so the whole page gets dropped anyway."),
    // terminal punctuation but under five words per line
    -14L -> "too short.\nstill short!\nvery short?",
    // only two surviving lines -> under the three-line floor
    -15L -> ("the first surviving line has five words.\n" +
      "the second surviving line also has enough words."),
    // quote-terminated lines count as terminal punctuation
    -16L -> ("he said the words were truly \"done\"\nwait this one has no ending quote mark.\n" +
      "the narrator continued with the full story.\n" +
      "and the chapter closed on that final note."))

  /** Spark-side union of the corpus (doc_id, text) with planted pages. */
  def withPlanted(spark: SparkSession, docs: DataFrame,
                  planted: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .unionByName(planted.toDF("doc_id", "text"))
  }

  /** DuckDB-side mirror of [[withPlanted]] as a CTE body. */
  def plantedRelSql(planted: Seq[(Long, String)]): String = {
    val rows = planted.map { case (id, t) =>
      val esc = t.replace("'", "''")
      s"($id, '$esc')"
    }.mkString(",\n    ")
    s"""SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $rows) AS p(doc_id, text)""".stripMargin
  }
}
