package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a codegen'd Catalyst
  * expression — the text-cleanup primitive every multilingual corpus
  * pass needs before hashing/dedup: the same user-visible string
  * arrives both precomposed (é = U+00E9) and decomposed
  * (e + U+0301), and every byte-level operator downstream (sha-256
  * canonical dedup, MinHash shingles, boilerplate hashes) treats the
  * two as different documents unless ingestion canonicalizes first.
  *
  * Backed by `java.text.Normalizer` (ICU-derived, in the JDK — no new
  * dependency). The form is compiled into the expression (a literal,
  * like [[TokenSetCount]]'s word set), so the hot loop is one static
  * call with a constant form — fully inside whole-stage codegen.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation
  * and true for pure-ASCII input, so the common case never copies.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // fail fast at ANALYSIS time on a bad form name, not per row
  private val resolvedForm = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_normalize_$form"

  override protected def nullSafeEval(text: Any): Any =
    UnicodeNormalize.normalize(text.asInstanceOf[UTF8String], resolvedForm.name)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.normalize($c, "${resolvedForm.name}")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  /** Shared by interpreted eval and generated code (static forwarder).
    * `form` is a validated Form name (constant-folded in codegen). */
  def normalize(text: UTF8String, form: String): UTF8String = {
    val s = text.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  /** Column API: `nfc(col)` etc. */
  def nfc(c: Column): Column = build(c, "NFC")
  def nfd(c: Column): Column = build(c, "NFD")
  def nfkc(c: Column): Column = build(c, "NFKC")

  /** Accent folding: decompose canonically, then drop every combining
    * mark (Unicode category Mn) — é→e, Å→A, ñ→n — the search-index
    * normalization that lets "resume" match "résumé". Composed from
    * the codegen'd NFD pass and Spark's native regexp (both stay in
    * whole-stage codegen); precomposed and decomposed spellings fold
    * identically by construction. */
  def asciiFold(c: Column): Column =
    org.apache.spark.sql.functions.regexp_replace(nfd(c), "\\p{Mn}", "")

  def build(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  /** Registers `unicode_normalize(text, 'NFC')` for spark.sql texts. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", exprs => fromExprs(exprs), "built-in")

  def fromExprs(exprs: Seq[Expression]): Expression = exprs(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        s: UTF8String, _) => UnicodeNormalize(exprs.head, s.toString)
    case _ => throw new IllegalArgumentException(
      "unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') requires a literal form")
  }
}
