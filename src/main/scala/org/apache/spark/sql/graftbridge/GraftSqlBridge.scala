package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for the `private[sql]` Column↔Expression converters —
  * the standard technique for libraries that extend Spark with custom
  * Catalyst expressions (Spark's public Column API deliberately hides the
  * expression constructor since 4.0). Confined to this one object; all
  * graft code goes through [[graft.functions.GraftFunctions]].
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — needed to hand custom logical nodes like
    * [[graft.plans.TopKPerKey]] to the planner.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a SQL function on a LIVE session's FunctionRegistry
    * (`sessionState` is `private[sql]`, hence bridged here). The
    * builder-time path is `graft.functions.GraftExtensions` via
    * `spark.sql.extensions`; this covers sessions the caller didn't
    * build.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
