package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Spark 4 hides Column↔Expression and LogicalPlan↔DataFrame conversion
  * behind `private[sql]` (org.apache.spark.sql.classic.*). This bridge lives
  * in the org.apache.spark.sql namespace to expose exactly those
  * conversions to graft's planner — no Spark internals are modified.
  */
object Bridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** DataFrame over an arbitrary (resolved) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The pre-CBO rule list an extensions instance would install — lets
    * specs assert WHERE a rule was injected without building a whole
    * session around the extensions class (`buildPreCBORules` is
    * `private[sql]`).
    */
  def preCBORules(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]] =
    ext.buildPreCBORules(spark)
}
