package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression → Column bridge for graft's native Catalyst expressions that
  * carry non-expression state (e.g. a `Broadcast` handle) and therefore
  * can't go through the SQL function registry like the rest of
  * graft.functions. Lives in an `org.apache.spark.sql` subpackage solely to
  * reach the `private[sql]` ExpressionUtils — the one-liner every Spark
  * extension library (Delta, Sedona, ...) carries post-Spark-4's Column
  * refactor.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
