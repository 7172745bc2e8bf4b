package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between graft's custom Catalyst expressions and the public
 * `Column` API. Spark 4 removed `new Column(Expression)`; the supported
 * classic-session conversion lives in `ExpressionUtils`, which is
 * `private[sql]` — hence this one-file shim inside the sql package space.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
