package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression adapters. Spark 4 made these `private[sql]`
  * (columnNodeSupport.scala), so extension libraries expose them from a
  * subpackage of org.apache.spark.sql — the standard pattern for
  * third-party Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
