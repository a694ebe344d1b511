package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** `argmin2(k1, k2, v)` / `argmax2(k1, k2, v)` — the value `v` carried by
  * the row whose (k1, k2) ordinal pair is lexicographically extreme.
  *
  * Why this exists: Spark's own `min_by(v, struct(k1, k2))` is semantically
  * identical, but a struct-typed ordering column is IMMUTABLE in the
  * aggregation buffer, and one immutable buffer field demotes the whole
  * aggregate (and everything grouped with it) from HashAggregate to
  * SortAggregate — a per-partition sort on the grouping key that costs
  * real time at 100 TB. Packing the ordinal into a string has the same
  * problem (strings are varlen ⇒ immutable too). This DeclarativeAggregate
  * keeps the buffer at four PRIMITIVE fields (long, long, double, boolean)
  * — every field mutable, so HashAggregate applies, partial aggregation
  * map-side combines, and the whole pipeline stays in whole-stage codegen
  * (the update/merge trees below are plain comparison expressions, all
  * codegen-able).
  *
  * Semantics: null in any of (k1, k2, v) ⇒ the row is ignored (the
  * three-column tuple is not a candidate); empty/all-null group ⇒ null —
  * matching `min_by` with non-null ordinals. Ordinal ties cannot occur
  * when (k1, k2) is unique per group (the OHLC ordinal (epoch-micros,
  * event_id) is); if they do, the first-seen candidate wins per partial
  * and merge order decides — same contract as Spark's min_by.
  */
case class ArgExtremum(
    k1: Expression, k2: Expression, v: Expression, findMin: Boolean)
  extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(k1, k2, v)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (k1.dataType != LongType || k2.dataType != LongType)
      TypeCheckFailure(s"argmin2/argmax2 ordinals must be BIGINT, got " +
        s"(${k1.dataType.simpleString}, ${k2.dataType.simpleString})")
    else if (v.dataType != DoubleType)
      TypeCheckFailure(s"argmin2/argmax2 value must be DOUBLE, got ${v.dataType.simpleString}")
    else TypeCheckSuccess
  }

  private lazy val bK1 = AttributeReference("ax_k1", LongType, nullable = false)()
  private lazy val bK2 = AttributeReference("ax_k2", LongType, nullable = false)()
  private lazy val bV = AttributeReference("ax_v", DoubleType, nullable = false)()
  private lazy val bSet = AttributeReference("ax_set", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bK1, bK2, bV, bSet)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0.0), Literal(false))

  /** (nk1, nk2) strictly better than the buffered ordinal. */
  private def beats(nk1: Expression, nk2: Expression,
                    ok1: Expression, ok2: Expression): Expression =
    if (findMin)
      Or(LessThan(nk1, ok1), And(EqualTo(nk1, ok1), LessThan(nk2, ok2)))
    else
      Or(GreaterThan(nk1, ok1), And(EqualTo(nk1, ok1), GreaterThan(nk2, ok2)))

  override lazy val updateExpressions: Seq[Expression] = {
    val candidate =
      And(IsNotNull(k1), And(IsNotNull(k2), IsNotNull(v)))
    val take = And(candidate, Or(Not(bSet), beats(k1, k2, bK1, bK2)))
    Seq(
      If(take, k1, bK1),
      If(take, k2, bK2),
      If(take, v, bV),
      Or(bSet, candidate))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val takeRight = And(bSet.right,
      Or(Not(bSet.left), beats(bK1.right, bK2.right, bK1.left, bK2.left)))
    Seq(
      If(takeRight, bK1.right, bK1.left),
      If(takeRight, bK2.right, bK2.left),
      If(takeRight, bV.right, bV.left),
      Or(bSet.left, bSet.right))
  }

  override lazy val evaluateExpression: Expression =
    If(bSet, bV, Literal(null, DoubleType))

  override def prettyName: String = if (findMin) "argmin2" else "argmax2"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgExtremum =
    copy(k1 = newChildren(0), k2 = newChildren(1), v = newChildren(2))
}
