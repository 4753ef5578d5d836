package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 routes `Column` through ColumnNode (Connect-compatible) instead
  * of exposing `.expr`; libraries that add native Catalyst expressions use
  * a shim in an `org.apache.spark.sql` subpackage to reach the classic
  * converter (same approach as public Spark-extension libraries — see
  * SNIPPETS.md [1],[3]).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
