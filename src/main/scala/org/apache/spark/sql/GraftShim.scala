package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), which Spark 4 hid
  * behind the Connect-compatible Column API. Compiling one accessor
  * object inside the `org.apache.spark.sql` package is the standard
  * technique third-party Spark libraries use to build `Column`s from
  * custom Catalyst `Expression`s without requiring session-level
  * function registration (keeping graft queries usable from ANY
  * SparkSession, not just ones built with our extensions installed).
  */
object GraftShim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(spark: SparkSession, c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
