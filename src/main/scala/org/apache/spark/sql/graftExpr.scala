package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from Catalyst `Expression` to the public `Column` API (Spark 4
  * moved Column onto ColumnNode; ExpressionUtils is private[sql], so this
  * one-liner lives in the sql package). No session registry needed — plans
  * built this way work under any SparkSession, including the driver's. */
object graftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
