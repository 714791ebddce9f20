package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (§7.3(b) exemplar): predicate pushdown through
  * [[AsOfJoinPlan]].
  *
  * Catalyst's own `PushDownPredicates` only understands the operators it
  * knows — a custom node is an optimization BARRIER by default, so
  * `events.asofJoin(orders).filter(left-side predicate)` would scan and
  * shuffle the full left side and filter last. This rule restores the
  * free lunch for the one direction that is semantics-preserving:
  *
  *  - LEFT-side conjuncts (references ⊆ left.outputSet, deterministic)
  *    push below the join. Safe because the backward as-of match of a
  *    left row depends only on that row and the right side — dropping
  *    other LEFT rows can never change a surviving row's match.
  *  - RIGHT-side conjuncts must NOT push: dropping a right row changes
  *    which row is "most recent" for every later left time (a filter on
  *    the matched payload is not a filter on the match candidates).
  *    They stay above the join, preserved exactly.
  *
  * Registered via `GraftExtensions.injectOptimizerRule`; effect is
  * plan-asserted in AsOfJoinSpec (the pushed predicate reaches the left
  * parquet scan's PushedFilters).
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => other :: Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case f @ Filter(cond, j: AsOfJoinPlan) =>
        val (pushable, kept) = splitConjuncts(cond).partition(c =>
          c.deterministic && c.references.subsetOf(j.left.outputSet))
        if (pushable.isEmpty) f
        else {
          val pushed = j.copy(left =
            Filter(pushable.reduce(And), j.left))
          kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
}
