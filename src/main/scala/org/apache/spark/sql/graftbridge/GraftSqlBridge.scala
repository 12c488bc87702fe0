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
}
