package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Policy-as-optimizer-rule: when `spark.graft.approxDistinct` is true,
  * every single-argument COUNT(DISTINCT x) in the plan is rewritten to the
  * HyperLogLog++ sketch aggregate (`approx_count_distinct`, rsd from
  * `spark.graft.approxDistinct.rsd`, default 0.05) — the documented
  * 10¹²-row swap (q13 / q37_profile_approx / q49_dq scaladocs, licensed by
  * the HllMergeSpec sketch-union proof) applied MECHANICALLY to whatever
  * query arrives, instead of hand-edited per lane. This is the
  * `injectOptimizerRule` leg of SparkSessionExtensions (the engine's
  * expressions are the `injectFunction` leg): a cluster operator flips one
  * conf on the 100 TB profile job and every COUNT(DISTINCT) in every
  * ad-hoc query drops its exact-distinct shuffle for a mergeable sketch —
  * no query rewrite, no redeploy.
  *
  * Scope guards, deliberately narrow:
  *  - only `Count` with ONE child and `isDistinct` — multi-column
  *    COUNT(DISTINCT a, b) has no HLL++ equivalent with the same null
  *    semantics, and non-distinct counts are exact for free;
  *  - the rewritten AggregateExpression KEEPS its resultId, so references
  *    in parent plans (projections, sorts, havings) resolve unchanged;
  *  - filter clauses (`COUNT(DISTINCT x) FILTER (WHERE ..)`) ride along
  *    untouched on the new aggregate.
  *
  * The rewrite is opt-in per session/job and the default is OFF: exact
  * results remain the correctness-gate posture (every oracle lane runs
  * with the flag unset). ApproxDistinctRuleSpec pins the rewrite shape,
  * the resultId stability, the flag gating, and the estimate's agreement
  * with a direct approx_count_distinct call.
  */
class ApproxDistinctRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val on = conf.getConfString("spark.graft.approxDistinct", "false").toBoolean
    if (!on) plan
    else {
      val rsd = conf.getConfString("spark.graft.approxDistinct.rsd", "0.05").toDouble
      plan.transform {
        case agg: Aggregate =>
          agg.transformExpressions {
            case AggregateExpression(Count(Seq(child)), mode, true, filter, resultId) =>
              AggregateExpression(
                HyperLogLogPlusPlus(child = child, relativeSD = rsd),
                mode, isDistinct = false, filter, resultId)
          }
      }
    }
  }
}
