package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column ⇄ Expression converters, for
  * registering the engine's native Catalyst expressions (e.g.
  * `graft.functions.Md5Word`) through the public Column API.
  */
object GraftBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
