package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions. Spark 4 made
  * the converters `private[sql]` (`ExpressionUtils`), so extension libraries
  * reach them from inside the `org.apache.spark.sql` package — this shim is
  * the only file that does; all engine code stays in `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a (resolved) logical plan — `Dataset.ofRows` is
    * likewise `private[sql]`; needed to hand custom logical nodes (e.g. the
    * as-of join) to the session's planner. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
