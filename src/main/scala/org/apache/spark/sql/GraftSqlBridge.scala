package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * `ExpressionUtils` (and `Column`'s expression constructor) are
  * `private[sql]` in Spark 4, so extension libraries shipping custom
  * expressions expose them through a shim in this package — the same
  * pattern used by public Spark extension projects. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
