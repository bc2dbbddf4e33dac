package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression and DataFrame ↔ LogicalPlan adapters. Spark 4
  * made these `private[sql]` (columnNodeSupport.scala, classic.Dataset),
  * so extension libraries expose them from a subpackage of
  * org.apache.spark.sql — the standard pattern for third-party Catalyst
  * expressions and plan nodes. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column → catalyst Expression conversion. `expression` wraps
    * the internal ColumnNode in a lazy ColumnNodeExpression; that node
    * is NOT java-serializable, so an expression destined for a custom
    * plan node (shipped inside task closures) must be converted up
    * front. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** The analyzed logical plan under a DataFrame (custom plan nodes are
    * built on top of it). */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** DataFrame over an arbitrary logical plan (runs the analyzer). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
