package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> Expression converters so graft's
  * codegen Catalyst expressions can be used as DataFrame Columns without
  * per-session function registration. Standard extension-library shim
  * (same pattern every Spark connector/extension uses). */
object GraftExprAccess {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
