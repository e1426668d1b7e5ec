package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst `Expression`s and the public
  * `Column` API. Spark 4 hid the Expression↔Column conversions behind
  * `private[sql]` (columns now wrap `ColumnNode`s for Connect), so
  * this one-file shim lives under `org.apache.spark.sql` to reach
  * them — the same approach Spark-native extension libraries use.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
