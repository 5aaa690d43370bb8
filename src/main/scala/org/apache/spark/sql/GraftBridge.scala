package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * converters, so graft's custom Catalyst expressions can surface as
  * ordinary `Column`s. Lives in the org.apache.spark.sql package by
  * design — the standard pattern for third-party Catalyst extensions
  * built against Spark 4's sealed Column API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
