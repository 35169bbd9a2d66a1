package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Sentence-boundary offsets under the pinned rule table
  * [[graft.ext.Sentences]] (UAX #29-informed: terminals + closer
  * stripping + abbreviation suppression), as one codegen'd pass over
  * the text — the whole sentence relation then derives with row-local
  * column algebra, NO shuffle and no per-token explode (the
  * [[CdcBoundaries]] shape).
  *
  * Emits the ascending 0-based char offsets one PAST each
  * sentence-terminating token (end-exclusive). The caller appends the
  * text end for the unterminated final sentence (UAX SB2), mirroring
  * [[graft.ext.Chunking.cdcChunks]]' boundary plumbing. Offsets are
  * char positions (= code points for the ASCII corpus this engine's
  * char-offset oracles pin).
  */
case class SentenceEnds(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sentence_ends"

  override protected def nullSafeEval(text: Any): Any =
    SentenceEnds.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SentenceEnds.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SentenceEnds {

  /** Shared by interpreted eval and generated code: scan space-
    * delimited tokens, test each against the shared rule. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < s.length && s.charAt(j) != ' ') j += 1
        if (graft.ext.Sentences.isSentenceEnd(s.substring(i, j))) out += j
        i = j
      }
    }
    new GenericArrayData(out.toArray)
  }

  def sentence_ends(c: Column): Column =
    ColumnBridge.column(SentenceEnds(ColumnBridge.expression(c)))
}
