package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in acceleration rewrite: `count(DISTINCT x)` → HyperLogLog++.
  *
  * Exact distinct-count forces Catalyst's Expand-based double aggregation —
  * at 100 TB the shuffle carries every distinct key. When a dashboard
  * tolerates the sketch's ~2% error, flipping
  * `spark.graft.approxDistinct.enabled=true` turns every eligible
  * `count(DISTINCT x)` in the session into `approx_count_distinct(x)`
  * WITHOUT touching query text — the accelerator move BI layers make, here
  * as a ~20-line optimizer `Rule[LogicalPlan]` installed by
  * [[GraftExtensions]].
  *
  * Eligibility is deliberately conservative: single-argument COUNT, no
  * FILTER clause, distinct-marked. Multi-column distinct and filtered
  * aggregates keep exact semantics.
  */
object RewriteCountDistinctToSketch extends Rule[LogicalPlan] {
  val FlagKey = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    // equalsIgnoreCase, not toBoolean: a malformed flag value ("1", "yes")
    // must degrade to disabled, not throw inside the optimizer on EVERY
    // query in the session
    if (!conf.getConfString(FlagKey, "false").equalsIgnoreCase("true")) plan
    else plan.transform {
      case agg: Aggregate => agg.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, None, _)
            if c.children.size == 1 =>
          // relativeSD pinned explicitly to the ~2% the doc promises —
          // the constructor default is 0.05 (ADVICE r9)
          ae.copy(aggregateFunction =
            HyperLogLogPlusPlus(c.children.head, relativeSD = 0.02),
            isDistinct = false)
      }
    }
}
