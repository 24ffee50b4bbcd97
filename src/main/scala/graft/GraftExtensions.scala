package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{ReduceAgg, ReduceAggPlaceholder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Swaps the fully-bound [[ReduceAggPlaceholder]] for the real mergeable
  * aggregate. Runs inside the analyzer's fixed-point Resolution batch (where
  * SparkSessionExtensions resolution rules are appended), so by the time it
  * fires the lambdas are bound and type-coerced, and the resulting
  * AggregateExpression is in place before GlobalAggregates / CheckAnalysis
  * look for it. See ReduceAggPlaceholder's scaladoc for why the SQL registry
  * path cannot return the aggregate directly.
  */
object ResolveReduceAgg extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveExpressions {
    case p: ReduceAggPlaceholder if p.resolved =>
      ReduceAgg(p.input, p.initial, p.inputFn, p.combineFn).toAggregateExpression()
  }
}

/** Graft's Spark session extensions — install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`) on the session builder, the same
  * registration pattern Delta/Iceberg use. Sessions built without it still
  * get every graft function; reduce_agg then falls back to a value-correct
  * single-pass fold (see Rewrites) instead of the mergeable aggregate.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(_ => ResolveReduceAgg)
}
