package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column an opaque ColumnNode wrapper; the Expression
  * conversions live in `private[sql]` ExpressionUtils. This bridge exposes
  * exactly the two conversions our native expressions need (same technique
  * third-party Spark extensions use for the classic API).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
