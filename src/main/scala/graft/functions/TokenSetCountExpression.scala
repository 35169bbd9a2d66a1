package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of space-separated tokens of `lower(text)` that belong to a
  * fixed word set — the per-record primitive under sentiment scoring
  * and language ID (SURVEY.md §4.2 codegen discipline).
  *
  * Replaces `size(filter(split(lower(text), " "), t.isin(words)))`:
  * Catalyst's higher-order `ArrayFilter` evaluates its lambda
  * INTERPRETED and breaks the enclosing whole-stage-codegen span, and
  * it materializes the token array only to count members. This
  * expression participates in codegen (one static call per row), scans
  * the string once, and allocates no array. Token semantics are
  * identical to `split(lower(text), " ")` with its -1 limit: single
  * space delimiter, empty tokens preserved (never in the word set).
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_count"

  private lazy val wordSet: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    words.foreach(h.add)
    h
  }

  override protected def nullSafeEval(text: Any): Any =
    TokenSetCount.count(text.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSetCount.count($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSetCount {

  /** Shared by interpreted eval and generated code (static forwarder). */
  def count(text: UTF8String, set: java.util.HashSet[String]): Int = {
    val s = text.toLowerCase.toString
    var cnt = 0
    var start = 0
    var done = false
    while (!done) {
      val idx = s.indexOf(' ', start)
      val tok = if (idx < 0) s.substring(start) else s.substring(start, idx)
      if (set.contains(tok)) cnt += 1
      if (idx < 0) done = true else start = idx + 1
    }
    cnt
  }

  /** Column API used by [[Sentiment.sentimentCol]] and
    * [[graft.ext.TextStats.langIdCol]]. */
  def token_set_count(text: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokenSetCount(ColumnBridge.expression(text), words))
}
