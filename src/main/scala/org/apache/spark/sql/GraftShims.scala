package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building Columns from custom Catalyst Expressions. Spark 4
  * made `Column(expr)` / `Column.expr` private[sql] (Connect split); this is
  * the standard shim used by Spark extension libraries — one file in the
  * org.apache.spark.sql package, nothing else.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
