package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar '02) of a space-tokenized document — the
  * map-stage primitive of `Dedup.simhashPairs`, as a codegen'd Catalyst
  * expression (SURVEY.md §4.2 codegen discipline: a Scala UDF here
  * breaks the scan stage's whole-stage-codegen span and pays
  * per-row boxing on 100 TB of documents; this form is one static call
  * inside the generated loop).
  *
  * Bit-identical to the historical UDF: FNV-1a per token
  * ([[graft.ext.Hashing.fnv1a64]] semantics inlined over UTF-16 chars),
  * ±1 vote per bit plane, sign → bit. Empty tokens are skipped, exactly
  * like `split(text, " ", -1)` + nonEmpty.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(text: Any): Any =
    SimHash64.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val acc = new Array[Int](64)
    val n = s.length
    var start = 0
    while (start <= n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) { // skip empty tokens
        // FNV-1a over the token's chars (same as Hashing.fnv1a64)
        var h = graft.ext.Hashing.FnvOffset
        var i = start
        while (i < end) {
          h ^= s.charAt(i).toLong
          h *= graft.ext.Hashing.FnvPrime
          i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      start = end + 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash64Col(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
