package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Catalyst Expression bridge. Spark 4 made the classic
  * bridge (`org.apache.spark.sql.classic.ExpressionUtils`)
  * private[sql]; extension libraries conventionally expose it via a
  * shim in the sql package — the same pattern public Spark packages
  * use for custom expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
