package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd K=12 MinHash signature: input is the per-shingle base-hash
  * array (`h60(s) mod p`, `array<long>`), output the K minima of
  * `(aᵢ·h + bᵢ) mod p` — ONE pass over the array where the SQL
  * formulation (`array(array_min(transform(hs, ...)), ... ×12)`) walks it
  * twelve times through interpreted higher-order lambdas. Constants come
  * from [[MinHashFamily]], and the arithmetic is the same Java long
  * mul/add/mod the SQL path uses (`a·h` peaks below 2⁶³: a < p ≈ 2³⁰,
  * h < p), so values are bit-identical to the columnar formulation, the
  * sketch aggregates, and the DuckDB oracle.
  *
  * Empty input yields the identity signature (all `Long.MaxValue`) —
  * matching [[MinHashSketch]]'s empty buffer. (The SQL formulation yields
  * an array of nulls instead; no call site can see the difference because
  * every consumer guards shingle-bearing docs — `docsWithShingles`'
  * ≥3-token filter.)
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  import MinHashFamily._

  override def prettyName: String = "minhash12"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash12 expects array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // null elements are SKIPPED — exactly array_min's null semantics in
      // the reference formulation (transform propagates the null,
      // array_min ignores it)
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < K) {
          val v = (A(k) * h + B(k)) % P
          if (v < m(k)) m(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val ms = (0 until K).map(k => ctx.freshName(s"min$k"))
      val decls = ms.map(m => s"long $m = Long.MAX_VALUE;").mkString("\n")
      val updates = (0 until K).map { k =>
        s"""$v = (${A(k)}L * $h + ${B(k)}L) % ${P}L;
           |if ($v < ${ms(k)}) ${ms(k)} = $v;""".stripMargin
      }.mkString("\n")
      s"""
         |final int $n = $arr.numElements();
         |$decls
         |long $v;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $arr.getLong($i);
         |    $updates
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[]{${ms.mkString(", ")}});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
