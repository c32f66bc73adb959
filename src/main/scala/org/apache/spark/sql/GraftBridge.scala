package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the standard pattern for extension libraries that ship custom
  * Catalyst expressions (the public API deliberately hides the classic
  * backend's Expression plumbing since Spark 4). Nothing else in graft
  * lives in the Spark namespace. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
