package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ClassicConversions, ExpressionUtils}

/** The two `private[sql]` doors graft's custom-plan API needs: turning a
  * hand-built `LogicalPlan` into a `DataFrame`, and unwrapping a public
  * `Column` to its Catalyst `Expression`. Both are package-private to
  * `org.apache.spark.sql` in Spark 4's classic module, so this bridge
  * lives under that package — the standard pattern Spark-extension
  * libraries use. Everything else in graft stays in `graft.*` against
  * public APIs.
  */
object GraftPlanBridge extends ClassicConversions {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(castToImpl(spark), plan)

  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  def analyzed(df: DataFrame): LogicalPlan =
    castToImpl(df).queryExecution.analyzed
}
