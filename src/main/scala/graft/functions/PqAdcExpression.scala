package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** `pq_adc(lut, codes)` — product-quantization asymmetric distance
  * computation as a codegen'd Catalyst expression: the approximate
  * inner product ⟨q, recon(x)⟩ = Σⱼ lut[j·ks + codes[j]] where `lut`
  * is the query's per-subspace dot-product table
  * ([[graft.ext.Ivf.PqModel.lut]], broadcast with the query row) and
  * `codes` is the candidate's m-byte PQ code word stored as a BINARY
  * column in the index.
  *
  * This is the per-CANDIDATE-PAIR hot scalar of the PQ serving path —
  * the same position [[DotProduct]] holds for float vectors, so it
  * gets the same treatment: raw unsafe-array + byte-array reads,
  * inlined as one static call in the generated loop, no boxed UDF, no
  * codegen fence. m table lookups replace a dim-length multiply-add —
  * the arithmetic the PQ literature calls ADC (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * `ks` (codebook size per subspace) is part of the EXPRESSION — the
  * lut stride is fixed by the model that built the table, exactly like
  * [[TokenSetCount]]'s compiled-in word list.
  */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqAdc.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) => s"graft.functions.PqAdc.adc($l, $c, $ks)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  /** Shared by interpreted eval and generated code (static forwarder).
    * Codes index as unsigned bytes; a code word shorter than the lut
    * implies (lut length / ks) subspaces — iterate over the codes. */
  def adc(lut: ArrayData, codes: Array[Byte], ks: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      val idx = j * ks + (codes(j) & 0xff)
      if (idx < lut.numElements()) s += lut.getDouble(idx)
      j += 1
    }
    s
  }

  /** Children cast to array<double> / binary so uncastable inputs fail
    * analysis instead of classcasting at run time (the DotProduct.build
    * pattern). */
  def build(lut: Expression, codes: Expression, ks: Int): PqAdc =
    PqAdc(Cast(lut, ArrayType(DoubleType)), Cast(codes, BinaryType), ks)

  def adcCol(lut: Column, codes: Column, ks: Int): Column =
    ColumnBridge.column(build(ColumnBridge.expression(lut),
      ColumnBridge.expression(codes), ks))
}
