package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSparkSession}

/** `Dataset.ofRows` is private[sql]; libraries that build Dataframes from
  * rewritten LogicalPlans (Delta, Sedona, ...) use a package shim like this.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column <-> Catalyst bridges (Spark 4 split the public Column from its
    * expression; these go through the classic session's converters).
    */
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)

  /** SQL text of a column's expression — used to splice columns into
    * higher-order-function `expr(...)` strings.
    */
  def sqlOf(c: Column): String = ExpressionUtils.expression(c).sql
}
