package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The two `private[sql]` doorways the custom-operator ladder needs:
  * wrapping a LogicalPlan as a DataFrame (`Dataset.ofRows`) and
  * unwrapping a Column to its Catalyst Expression — neither has a
  * public equivalent in Spark 4's split API. This object lives under
  * the `org.apache.spark.sql` namespace solely to reach them (the
  * standard pattern Spark extension libraries use); nothing else is
  * accessed. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
