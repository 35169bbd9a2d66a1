package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Checksum-validated payment-card redaction, as a codegen'd
  * expression for the PII-scrub hot path: contiguous runs of 13–19
  * digits are replaced with `[CARD]` IFF they pass the Luhn check
  * (ISO/IEC 7812) — the validation that separates card numbers from
  * order ids, timestamps, and phone numbers, which a bare regexp scrub
  * would mangle. Runs that fail the checksum pass through untouched;
  * digit-free text takes a zero-allocation fast path.
  */
case class LuhnRedact(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "luhn_redact"

  override protected def nullSafeEval(text: Any): Any =
    LuhnRedact.redact(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnRedact.redact($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LuhnRedact {

  private val MinLen = 13
  private val MaxLen = 19

  /** Shared by interpreted eval and generated code. */
  def redact(text: UTF8String): UTF8String = {
    val s = text.toString
    var i = 0
    var found = false
    while (i < s.length && !found) { // fast path: any digit at all?
      if (s.charAt(i) >= '0' && s.charAt(i) <= '9') found = true
      i += 1
    }
    if (!found) return text
    val out = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < s.length && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        val run = s.substring(i, j)
        if (run.length >= MinLen && run.length <= MaxLen && luhnValid(run))
          out.append("[CARD]")
        else out.append(run)
        i = j
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }

  /** ISO/IEC 7812 Luhn: from the rightmost digit, double every second
    * one, subtract 9 when over 9, total ≡ 0 (mod 10). */
  def luhnValid(digits: String): Boolean = {
    var sum = 0
    var alt = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  def luhn_redact(c: Column): Column =
    ColumnBridge.column(LuhnRedact(ColumnBridge.expression(c)))

  /** Registers `luhn_redact(text)` for spark.sql texts. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "luhn_redact", exprs => LuhnRedact(exprs.head), "built-in")
}
