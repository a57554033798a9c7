/*
 * Minimal access bridge: `org.apache.spark.sql.classic.ExpressionUtils` is
 * public bytecode but `private[sql]` at the Scala level, so third-party
 * code cannot name it. This one-file shim — the conventional pattern for
 * Spark-external Catalyst extensions — re-exports the two conversions the
 * graft expressions need. Nothing else from Spark internals is touched.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
