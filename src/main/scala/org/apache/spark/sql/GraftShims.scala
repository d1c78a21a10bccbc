package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * converters, for exposing custom Catalyst expressions
  * (graft.functions.*) through the public Column API. Standard practice
  * for Spark extension libraries on 4.x where Column no longer wraps an
  * Expression directly.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
