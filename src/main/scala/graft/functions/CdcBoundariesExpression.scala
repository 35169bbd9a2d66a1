package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (the Rabin/FastCDC family, public
  * since Muthitacharoen et al., SOSP '01 "LBFS"): a boundary lands
  * after position `i` whenever the polynomial hash of the `W`-byte
  * window ending at `i` satisfies `h % Mask == 0`. Because the
  * decision depends only on local content, an insertion early in a
  * document shifts ONLY the chunk it lands in — every later chunk
  * keeps its identity, which is what makes chunk-level dedup robust
  * against edits (fixed-size chunking loses all alignment after one
  * byte of drift).
  *
  * One pass over the UTF-8 bytes inside whole-stage codegen; emits the
  * ascending 1-based boundary END positions. All arithmetic is exact
  * small-field integer math (`Σ byte·B^j mod M`, products ≤ 2^41) so
  * an independent engine can replay it — the oracle recomputes every
  * window hash in SQL.
  */
case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override protected def nullSafeEval(text: Any): Any =
    CdcBoundaries.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcBoundaries.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Window width (bytes), hash base, modulus, boundary mask — the
    * tuple the oracle mirrors literally. Mask 64 ⇒ expected chunk
    * ~64 bytes on uniform content. */
  val W = 8
  val B = 257L
  val M = 1000000007L
  val Mask = 64L

  /** B^j mod M for j = 0..W-1 (coefficient of the j-th byte BEFORE the
    * window end — the newest byte carries B^0). */
  val Pow: Array[Long] = {
    val a = new Array[Long](W)
    a(0) = 1L
    for (j <- 1 until W) a(j) = a(j - 1) * B % M
    a
  }

  /** Shared by interpreted eval and generated code. Positions are
    * 1-based byte offsets (≥ W) where a boundary falls AFTER that
    * byte. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = W - 1
    while (i < bytes.length) {
      var h = 0L
      var j = 0
      while (j < W) {
        h += (bytes(i - j) & 0xffL) * Pow(j)
        j += 1
      }
      if (h % M % Mask == 0L) out += (i + 1)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def cdc_boundaries(c: Column): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expression(c)))
}
