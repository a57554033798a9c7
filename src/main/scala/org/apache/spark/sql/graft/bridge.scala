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

  /** Clone a session: shared SparkContext + a COPY of the current session
    * state (SQLConf, registered functions, temp views). `newSession()`
    * would start from SparkConf defaults, silently dropping runtime conf
    * the caller set; `cloneSession` is `private[sql]`, hence the bridge. */
  def cloneSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Wrap an (analyzed) logical plan back into a DataFrame —
    * `Dataset.ofRows` is `private[sql]`. Used by the tie-audit gate to
    * evaluate a query's sort-key uniqueness on the Sort node's CHILD,
    * where sort columns later dropped by a projection still exist. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a native-expression SQL function on a live session (the
    * runtime-registration twin of `SparkSessionExtensions.injectFunction`,
    * which only applies at session build). Used for the reference-parity
    * SQL functions that compile to built-in Catalyst expressions rather
    * than row-at-a-time UDFs. */
  def registerNativeFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                             builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
