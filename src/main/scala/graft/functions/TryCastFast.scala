package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Non-throwing fast path for `TRY_CAST(string AS INT/BIGINT)`.
  *
  * Spark 4 executes TRY-mode string→integral casts as the ANSI cast
  * wrapped in catch — `UTF8StringUtils.toIntExact` THROWS on every
  * invalid row, so a column where most rows fail (the whole point of
  * try_cast) pays JVM exception construction + fillInStackTrace per row:
  * measured 5.3 s warm for one all-invalid string column on 600 k rows
  * vs 0.3 s for every other try_* family member (round-11 probe; Spark's
  * TRY divide/add already null-out without throwing). The q20_try_funcs
  * lane was 80× its counted time on exactly this.
  *
  * The exact non-throwing equivalent: the legacy parser
  * `UTF8String.toInt(IntWrapper)` (boolean validity, zero exceptions)
  * agrees with ANSI `toIntExact` on every input EXCEPT strings containing
  * a decimal point — legacy truncates ('3.5' → 3, '.5' → 0), ANSI/TRY
  * rejects (→ null). Both trim the same surrounding whitespace, accept
  * the same sign/leading-zero forms, reject the same garbage ('1e3',
  * '4 2', '0x1F', non-ASCII digits), and null the same overflows
  * ('2147483648'). So: `toInt(wrapper) && !contains('.')` IS TRY-cast
  * semantics, with no exception on any path. TryCastFastSpec pins the
  * equivalence against `Cast(_, _, EvalMode.TRY).eval` (the genuine
  * Spark implementation, reached below the optimizer) on an edge-case
  * battery plus seeded fuzz corpora.
  *
  * Scope is deliberately string→INT/BIGINT only — the forms whose failure
  * mode is per-row throw. Fraction-bearing targets (double/decimal) parse
  * non-throwing upstream or have value-dependent rounding; casts between
  * non-string types don't take the exception path at all.
  *
  * [[TryCastFastPathRule]] rewrites the Cast node in the optimizer
  * (conf `spark.graft.tryCastFastPath`, default on), so user-facing SQL
  * keeps the stock `try_cast` spelling and the whole query surface —
  * not just the q20 lane — gets the fast path.
  */
abstract class TryStringToIntegralBase extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.sql}")
  }
}

case class TryToInt(child: Expression) extends TryStringToIntegralBase {
  override def prettyName: String = "try_to_int"
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val w = new UTF8String.IntWrapper
    if (s.toInt(w) && !s.contains(TryCastFast.DOT)) w.value else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val w = ctx.freshName("intWrapper")
      s"""
         |UTF8String.IntWrapper $w = new UTF8String.IntWrapper();
         |if ($c.toInt($w) && !$c.contains(graft.functions.TryCastFast.DOT())) {
         |  ${ev.value} = $w.value;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TryToInt =
    copy(child = newChild)
}

case class TryToLong(child: Expression) extends TryStringToIntegralBase {
  override def prettyName: String = "try_to_long"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val w = new UTF8String.LongWrapper
    if (s.toLong(w) && !s.contains(TryCastFast.DOT)) w.value else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val w = ctx.freshName("longWrapper")
      s"""
         |UTF8String.LongWrapper $w = new UTF8String.LongWrapper();
         |if ($c.toLong($w) && !$c.contains(graft.functions.TryCastFast.DOT())) {
         |  ${ev.value} = $w.value;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TryToLong =
    copy(child = newChild)
}

object TryCastFast {
  /** '.' as a UTF8String — static so the per-row contains() scan does no
    * allocation. '.' is single-byte ASCII, so a byte-level contains is an
    * exact character-level dot test in UTF-8. Referenced from generated
    * code (as the static-forwarder method `DOT()` — Janino resolves Scala
    * object vals only through the forwarder). */
  val DOT: UTF8String = UTF8String.fromString(".")
}

/** Optimizer rewrite: `Cast(string, INT|BIGINT, TRY)` → [[TryToInt]] /
  * [[TryToLong]]. Injected by [[GraftExtensions]] (user-provided batch,
  * runs to fixed point; the rewrite removes its own match so it is
  * idempotent). Gated on `spark.graft.tryCastFastPath` (default on) so the
  * stock throw-and-catch path stays one conf flip away for A/B or doubt. */
class TryCastFastPathRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val on = conf.getConfString("spark.graft.tryCastFastPath", "true").toBoolean
    if (!on) plan
    else plan.transformAllExpressions {
      case Cast(child, IntegerType, _, EvalMode.TRY)
          if child.resolved && child.dataType.isInstanceOf[StringType] =>
        TryToInt(child)
      case Cast(child, LongType, _, EvalMode.TRY)
          if child.resolved && child.dataType.isInstanceOf[StringType] =>
        TryToLong(child)
    }
  }
}
