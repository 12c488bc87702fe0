package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Flag-gated optimizer rule: rewrite exact `COUNT(DISTINCT x)` into
  * `approx_count_distinct(x)` (HyperLogLog++) when the session opts in
  * with `spark.graft.approxDistinct.enabled=true` — the classic
  * interactive-dashboard knob at corpus scale, where an exact distinct
  * costs a full shuffle of the distinct values (or an Expand ×
  * aggregations) and the caller only needs 2%-accurate counts.
  *
  * This is the `Rule[LogicalPlan]` integration point demonstrated on a
  * rewrite that is genuinely useful rather than decorative: it changes
  * RESULTS by design (approximate for exact), so it is opt-in per
  * session/query block, never default, and never touches multi-column
  * or filtered distincts (semantics there are subtler — left exact).
  * Registered alongside the function descriptors in [[GraftExtensions]]
  * via `injectOptimizerRule`, so `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` wires both.
  *
  * The rewrite sets a relative error of 0.02 (approx_count_distinct's
  * default, ~4 KB of sketch per group on the exchange).
  */
final case class ApproxDistinctRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private val flag = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.getOption(flag).contains("true")) plan
    else plan.transform { case agg: Aggregate =>
      agg.transformExpressions {
        case ae @ AggregateExpression(
              Count(children), Complete, isDistinct, None, _)
            if isDistinct && children.size == 1 =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(
              children.head, relativeSD = 0.02),
            isDistinct = false)
      }
    }
}
