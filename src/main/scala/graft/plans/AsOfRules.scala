package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: push filter conjuncts that reference only the LEFT
  * side's columns below an [[AsOfJoin]].
  *
  * Catalyst's own `PushPredicateThroughJoin` doesn't know graft's node,
  * so without this rule a predicate written after the as-of join sits
  * above it and the full left side is shuffled, sorted, and merged
  * before a single row is dropped. Pushing left-only predicates is
  * always sound here: every output row is exactly one left row extended
  * with (possibly null) right columns, so filtering left rows first
  * cannot change which survivors remain or what they match. Right-side
  * conjuncts stay put — dropping right rows CAN change the
  * latest-prior-match of a surviving left row.
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`; once
  * pushed, Spark's own rules keep going (down to parquet
  * `PushedFilters`, as AsOfJoinSpec asserts).
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
