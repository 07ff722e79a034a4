package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column <-> Expression bridge (`classic.ExpressionUtils`)
  * `private[sql]`; custom Catalyst expressions still need it to surface as
  * user-facing Columns. This shim re-exports exactly those two conversions —
  * the standard pattern for Spark-native extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
