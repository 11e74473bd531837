package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Count, HyperLogLogPlusPlus, Percentile}
import org.apache.spark.sql.types.{DoubleType, IntegerType}
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

/** Opt-in acceleration rewrite #2: exact `percentile(x, p)` →
  * `approx_percentile(x, p, accuracy)`.
  *
  * Exact Percentile buffers EVERY value per group (an
  * OpenHashMap[value, count] in the aggregation buffer) — at 100 TB a
  * single hot group OOMs an executor, which is why every A5-family
  * scaladoc says "swap in percentile_approx at scale". This rule makes
  * that swap a CONFIG FLIP instead of a query rewrite:
  * `spark.graft.approxPercentile.enabled=true` turns eligible exact
  * percentiles into the GK-sketch form (bounded buffer, mergeable,
  * rank error ≤ 1/accuracy) without touching query text. Accuracy comes
  * from `spark.graft.approxPercentile.accuracy` (default: Spark's own
  * 10000 ≙ ~0.01% rank error).
  *
  * Eligibility is deliberately conservative, mirroring
  * [[RewriteCountDistinctToSketch]]: DOUBLE-typed input only (approx
  * returns the INPUT type while exact always returns double — rewriting
  * an integer column would change the result type of an already-resolved
  * plan), unit frequency, no FILTER clause, non-distinct. Everything else
  * keeps exact semantics.
  */
object RewritePercentileToApprox extends Rule[LogicalPlan] {
  val FlagKey = "spark.graft.approxPercentile.enabled"
  val AccuracyKey = "spark.graft.approxPercentile.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FlagKey, "false").equalsIgnoreCase("true")) plan
    else {
      val accuracy = scala.util.Try(
        conf.getConfString(AccuracyKey,
          ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY.toString).toInt)
        .getOrElse(ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY)
      plan.transform {
        case agg: Aggregate => agg.transformExpressions {
          case ae @ AggregateExpression(
              p: Percentile, _, false, None, _)
              if p.child.dataType == DoubleType &&
                // DESC percentiles (Percentile(reverse=true) from WITHIN
                // GROUP (ORDER BY x DESC)) have no ApproximatePercentile
                // analog — rewriting would silently return the p-quantile
                // instead of the (1-p)-quantile; keep them exact
                !p.reverse &&
                p.frequencyExpression.foldable &&
                scala.util.Try(p.frequencyExpression.eval() == 1L)
                  .getOrElse(false) =>
            ae.copy(aggregateFunction = new ApproximatePercentile(
              p.child, p.percentageExpression,
              Literal(accuracy, IntegerType)))
        }
      }
    }
}
