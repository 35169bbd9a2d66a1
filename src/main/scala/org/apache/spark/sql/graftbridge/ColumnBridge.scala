package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved `Column.expr` behind
  * `private[sql] classic.ExpressionUtils`; third-party expression
  * libraries access it from inside the org.apache.spark.sql namespace
  * (the same technique Spark connectors use). This is the only file in
  * the repo outside the graft package.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
