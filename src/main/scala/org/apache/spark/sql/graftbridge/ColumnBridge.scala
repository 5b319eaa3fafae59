package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions.
  *
  * Spark 4.x routes `Column` through `ColumnNode`; wrapping a custom Catalyst
  * `Expression` as a user-facing `Column` (and back) needs these two calls,
  * which are `private[sql]`. This object lives in the `org.apache.spark.sql`
  * namespace solely to access them; everything else in graft uses the public
  * API.
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
