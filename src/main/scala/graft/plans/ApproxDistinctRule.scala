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
            case AggregateExpression(Count(Seq(child)), mode, true, filter, resultId)
                // Post-analysis rewrites skip re-analysis, so the swapped
                // aggregate's own checks never re-run — and HLL++'s
                // checkInputDataTypes accepts EVERYTHING (probed: even
                // VariantType passes it), while its per-row xxhash64
                // update throws for types the interpreted hash cannot
                // walk. Unguarded, COUNT(DISTINCT v) over a variant
                // column analyzes fine with the flag on and then dies in
                // the executor with an opaque task failure. Guard with a
                // recursive hashability check and leave unsupported
                // counts exact — the flag is an optimization policy, not
                // a semantics change.
                if ApproxDistinctRule.hashable(child.dataType) =>
              AggregateExpression(
                HyperLogLogPlusPlus(child = child, relativeSD = rsd),
                mode, isDistinct = false, filter, resultId)
          }
      }
    }
  }
}

object ApproxDistinctRule {
  import org.apache.spark.sql.types._

  /** Types the HLL++ per-row update (interpreted xxhash64) can actually
    * walk. Mirrors InterpretedHashFunction's structural recursion: atomic
    * types, intervals, and containers of hashable element types hash;
    * VariantType (and any future opaque type) does not — it is the
    * measured executor-side failure the rule must not plan into. */
  private[plans] def hashable(dt: DataType): Boolean = dt match {
    case _: VariantType => false
    case ArrayType(et, _) => hashable(et)
    case MapType(kt, vt, _) => hashable(kt) && hashable(vt)
    case StructType(fields) => fields.forall(f => hashable(f.dataType))
    case udt: UserDefinedType[_] => hashable(udt.sqlType)
    case NullType | CalendarIntervalType => true
    case _: DayTimeIntervalType | _: YearMonthIntervalType => true
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | BinaryType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType | _: StringType | _: CharType | _: VarcharType => true
    case _ => false
  }
}
