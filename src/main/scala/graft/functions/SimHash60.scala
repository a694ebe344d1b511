package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd 60-bit SimHash over a token-hash array: majority vote per bit
  * (+1 when set, −1 when clear, strictly-positive total sets the output
  * bit). Row-local — the replaced formulation exploded every token and ran
  * a 60-sum-column aggregation per doc, paying the explode row overhead, a
  * 60-wide aggregation buffer per exploded row, and a (small) shuffle;
  * this computes the same value in one pass over the array inside
  * whole-stage codegen with zero shuffle. Duplicate tokens vote once per
  * occurrence in both formulations, and the vote/packing arithmetic is
  * identical to the DuckDB oracle's bits/votes CTEs — bit-identical
  * outputs (SimHash60Spec proves it against the agg formulation on both
  * codegen and interpreted paths).
  *
  * Empty input yields 0L (no bit has a positive vote) — unreachable in
  * practice (split of any string yields ≥ 1 token).
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  private val Bits = 60

  override def prettyName: String = "simhash60"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      // null elements are SKIPPED (cannot occur from split of non-null
      // text; defined behavior for arbitrary SQL callers)
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < Bits) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var s = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) s |= 1L << b
      b += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val votes = ctx.freshName("votes")
      val s = ctx.freshName("sh")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $votes = new int[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < $Bits; $b++) {
         |      $votes[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $s = 0L;
         |for (int $b = 0; $b < $Bits; $b++) {
         |  if ($votes[$b] > 0) $s |= 1L << $b;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
