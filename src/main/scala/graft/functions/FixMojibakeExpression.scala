package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Repair double-encoded UTF-8 ("mojibake"): text whose UTF-8 bytes
  * were once misread as Latin-1 and re-encoded, turning é (C3 A9)
  * into Ã© (C3 83 C2 A9) — endemic in web crawls, where it defeats
  * dedup (the clean and broken spellings hash apart) and poisons
  * language ID. The ftfy-style single-step repair, as a codegen'd
  * expression:
  *
  * repair(s) = UTF-8-decode(Latin-1-bytes(s)) IFF
  *   (a) every char of `s` is ≤ U+00FF (Latin-1 representable),
  *   (b) those bytes form VALID UTF-8, and
  *   (c) at least one byte is non-ASCII (identity otherwise).
  *
  * The validity gate is what makes this safe on genuine Latin-1 text:
  * "Ã la carte" has bytes C3 20, an illegal UTF-8 continuation, so it
  * passes through untouched — only byte sequences that are
  * simultaneously Latin-1-representable AND well-formed UTF-8 (the
  * double-encoding signature) are re-decoded. ASCII takes a
  * zero-allocation fast path.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override protected def nullSafeEval(text: Any): Any =
    FixMojibake.repair(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixMojibake.repair($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixMojibake {

  /** Shared by interpreted eval and generated code. */
  def repair(text: UTF8String): UTF8String = {
    val s = text.toString
    var hasHigh = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xff) return text // not Latin-1 representable → no repair
      if (c > 0x7f) hasHigh = true
      i += 1
    }
    if (!hasHigh) return text // pure ASCII fast path
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) { bytes(i) = s.charAt(i).toByte; i += 1 }
    if (!validUtf8(bytes)) return text // genuine Latin-1 → untouched
    UTF8String.fromBytes(bytes)
  }

  /** Strict UTF-8 well-formedness (RFC 3629: no overlongs, no
    * surrogates, ≤ U+10FFFF) with at least the structure checks the
    * repair gate needs. */
  private def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= b.length || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= b.length || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80) return false
        val cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        if (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= b.length || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        if (cp < 0x10000 || cp > 0x10ffff) return false
        i += 4
      } else return false
    }
    true
  }

  def fix_mojibake(c: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(c)))

  /** Registers `fix_mojibake(text)` for spark.sql texts. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fix_mojibake", exprs => FixMojibake(exprs.head), "built-in")
}
