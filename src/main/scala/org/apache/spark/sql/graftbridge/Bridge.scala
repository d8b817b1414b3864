package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression (and DataFrame ⇄ LogicalPlan) bridge.
  * Spark 4 keeps these converters `private[sql]`, so third-party
  * engines host a shim inside the sql package — the established pattern
  * for libraries that ship native expressions and plan nodes
  * (cf. SNIPPETS.md [1][3]).
  */
object Bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
