package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Column↔Expression conversion behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils). This bridge lives in the
  * org.apache.spark.sql namespace to expose exactly those two conversions to
  * graft's custom Catalyst expressions — no Spark internals are modified.
  */
object Bridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
