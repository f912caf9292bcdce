package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the classic Column↔Expression converters, which are
  * `private[sql]` in Spark 4 (the pre-4.0 `new Column(expr)` constructor is
  * gone). Needed only for expressions that carry non-literal state (e.g. a
  * k-means centroid matrix) and so can't be routed through the SQL function
  * registry like the rest of graft.functions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
