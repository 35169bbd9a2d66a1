package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** T1 MIME detection as a native Catalyst expression
  * (SURVEY.md §7.4: the optional codegen upgrade over the UDF form).
  *
  * Unlike a `functions.udf`, this participates in whole-stage codegen:
  * no encoder round-trip per row — the generated code passes the raw
  * `byte[]` and `UTF8String` straight into the static detector. The
  * semantics are pinned by [[graft.extract.MimeDetect]], shared with
  * the UDF path.
  */
case class DetectMime(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "detect_mime"

  override protected def nullSafeEval(content: Any, filename: Any): Any =
    UTF8String.fromString(graft.extract.MimeDetect.detect(
      content.asInstanceOf[Array[Byte]],
      filename.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, f) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.extract.MimeDetect.detect($c, $f.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DetectMime {
  /** Column API: codegen'd alternative to [[Udfs.detectMime]]. */
  def detect_mime(content: Column, filename: Column): Column =
    ColumnBridge.column(DetectMime(
      ColumnBridge.expression(content), ColumnBridge.expression(filename)))

  /** Registers `detect_mime(content, filename)` for spark.sql texts. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "detect_mime", exprs => DetectMime(exprs.head, exprs(1)), "built-in")
}
