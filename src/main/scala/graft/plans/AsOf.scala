package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.GraftPlanBridge

/** DataFrame-side entry point for the native as-of join:
  *
  * {{{
  *   AsOf.joinBackward(events, orders,
  *     events("user_id"), orders("o_custkey"),
  *     events("ts"), orders("o_orderdate"))
  * }}}
  *
  * Output = left columns ++ right columns (right side nullable), one row
  * per left row. See [[AsOfJoinPlan]] for semantics and the scale
  * rationale.
  */
object AsOf {
  def joinBackward(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val plan = AsOfJoinPlan(
      GraftPlanBridge.analyzed(left),
      GraftPlanBridge.analyzed(right),
      GraftPlanBridge.expr(leftKey), GraftPlanBridge.expr(rightKey),
      GraftPlanBridge.expr(leftTime), GraftPlanBridge.expr(rightTime))
    GraftPlanBridge.ofRows(left.sparkSession, plan)
  }
}
