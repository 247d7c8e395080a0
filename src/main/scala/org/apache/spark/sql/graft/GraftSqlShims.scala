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

  /** Release the storage blocks behind a `localCheckpoint`'d frame NOW.
    * `Dataset.unpersist` only talks to the cache manager, but a local
    * checkpoint persists the frame's INTERNAL RDD directly — so for a
    * checkpointed frame `df.unpersist()` is a silent no-op and the blocks
    * live until ContextCleaner GC (the r16 components-spec finding). This
    * reaches through the checkpoint scan (`LogicalRDD`) and unpersists at
    * the RDD level; a plan that is not a checkpoint scan is left alone.
    */
  def unpersistCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
