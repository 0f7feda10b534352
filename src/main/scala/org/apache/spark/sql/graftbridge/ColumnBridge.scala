package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 removed the public `Column(expr)` constructor; the supported
 * Expression↔Column conversion lives in `private[sql] ExpressionUtils`.
 * This one-object bridge (in an `org.apache.spark.sql` subpackage, the
 * conventional extension-library escape hatch) re-exports just the two
 * conversions the graft custom expressions need.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
