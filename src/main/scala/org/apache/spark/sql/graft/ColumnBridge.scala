package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge for custom Catalyst expressions.
 * Spark 4 moved `Column` to a plan-agnostic API and gates the
 * expression conversion behind `private[sql]` — this shim (the usual
 * pattern for Catalyst extension libraries) re-exports just the two
 * conversions the engine needs.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
