package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** dot(a, b) over two array<double> columns as a codegen'd Catalyst
  * expression — the inner-loop primitive of the similarity family
  * (brute/LSH ANN re-rank, embedding near-dup verify), which runs once
  * per CANDIDATE PAIR, not once per row: at 100 TB this is the hottest
  * scalar in the engine. A Scala UDF here pays Seq boxing + a codegen
  * fence per pair; this form reads the unsafe array buffers directly
  * and inlines as one static call inside the generated loop.
  *
  * Summation is left-to-right over doubles — bit-identical to the
  * historical `Similarity.dotUdf` (and to DuckDB's
  * list_cosine_similarity inner product), so the oracle contracts are
  * unchanged. DotProductSpec pins the lockstep.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Shared by interpreted eval and generated code (static forwarder).
    * Shorter-array length wins, matching zip semantics. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Children are wrapped in a cast to array<double> — float/int arrays
    * coerce, a no-op cast is elided by SimplifyCasts, and an
    * uncastable input fails analysis instead of classcasting at run
    * time (ExpectsInputTypes is private[sql], so coercion is explicit). */
  def build(a: Expression, b: Expression): DotProduct =
    DotProduct(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))

  def dotCol(a: Column, b: Column): Column =
    ColumnBridge.column(build(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
