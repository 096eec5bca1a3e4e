package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`): the library defines
  * native Catalyst expressions ([[graft.functions.ZValue]],
  * [[graft.functions.CosineSimilarity]]) and needs to wrap them as
  * `Column`s for the DataFrame API without requiring callers to register
  * SQL functions first. Lives in the `org.apache.spark.sql` namespace
  * solely for access; no Spark behavior is modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
