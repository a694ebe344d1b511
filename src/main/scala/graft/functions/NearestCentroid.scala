package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd coarse-quantizer assignment: the id of the centroid with the
  * LARGEST dot product against the input vector, ties broken toward the
  * smallest centroid id. The centroid matrix rides inside the expression as
  * a plain `double[][]` reference object — it is the driver-held quantizer
  * of the IVF family (bounded ≤ 4096 × 256 dims ≈ 8 MB by construction,
  * see Similarity.kForCorpus), serialized once per task closure exactly
  * like a broadcast small side.
  *
  * Why a custom Expression (same reasoning as [[DotF]]): the assignment
  * pass is THE hot loop of IVF at scale — every vector × every centroid ×
  * every dimension, once per corpus scan. A higher-order-function
  * formulation (`array_max(transform(...))`) leaves the K-way loop
  * interpreted with one struct allocation per (row, centroid); this K×d
  * primitive loop stays inside WholeStageCodegen with zero allocation.
  *
  * Cosine vs dot: callers pass UNIT-normalized centroid rows, so argmax
  * dot ≡ argmax cosine (the row's own norm is a constant positive factor
  * across candidates). Rows are iterated in ascending-cid order with a
  * strict `>` comparison, which IS the (score desc, cid asc) tie-break of
  * the window/row_number formulation.
  */
case class NearestCentroid(
    child: Expression,
    cids: Array[Long],
    cents: Array[Array[Double]]) extends UnaryExpression {
  require(cids.length == cents.length && cids.nonEmpty,
    "NearestCentroid needs one id per centroid row and at least one row")

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isF = elemIsFloat
    var best = Double.NegativeInfinity
    var bid = cids(0)
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val len = math.min(n, c.length)
      var s = 0.0
      var i = 0
      while (i < len) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        s += x * c(i)
        i += 1
      }
      if (s > best) { best = s; bid = cids(k) }
      k += 1
    }
    bid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("cents", cents, "double[][]")
      val ids = ctx.addReferenceObj("cids", cids, "long[]")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val bid = ctx.freshName("bid")
      val getA = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bid = $ids[0];
         |for (int $k = 0; $k < $m.length; $k++) {
         |  final double[] $c = $m[$k];
         |  final int $len = java.lang.Math.min($n, $c.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $len; $i++) {
         |    $s += $getA * $c[$i];
         |  }
         |  if ($s > $best) { $best = $s; $bid = $ids[$k]; }
         |}
         |${ev.value} = $bid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Registry builder (`nearest_centroid(vec, cids, cents)`): the quantizer
    * arrives as two FOLDABLE array literals — evaluated once at plan build
    * into the primitive payload the codegen loop reads. Keeping the payload
    * in literal form makes the function registrable like every other graft
    * expression (usable from `spark.sql` too), at zero per-row cost. */
  private[functions] def fromExprs(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(child, cidsE, centsE) if cidsE.foldable && centsE.foldable =>
      val ids = cidsE.eval().asInstanceOf[ArrayData].toLongArray()
      val m = centsE.eval().asInstanceOf[ArrayData]
      val cents = Array.tabulate(m.numElements())(i => m.getArray(i).toDoubleArray())
      NearestCentroid(child, ids, cents)
    case _ => throw new IllegalArgumentException(
      "nearest_centroid expects (vector, foldable array<bigint> ids, " +
        "foldable array<array<double>> centroids)")
  }

  /** Column builder: UNIT-normalizes the centroid rows (so argmax dot ≡
    * argmax cosine) and sorts them by ascending cid (so the strict-`>`
    * scan realizes the (cos desc, cid asc) tie-break). */
  def nearestOf(vec: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    import org.apache.spark.sql.functions.{call_function, typedlit}
    val sorted = cents.sortBy(_._1)
    val ids = sorted.map(_._1)
    val unit = sorted.map { case (_, cv) =>
      var s = 0d; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      val inv = 1d / math.sqrt(s)
      cv.map(_ * inv)
    }
    call_function("nearest_centroid", vec, typedlit(ids), typedlit(unit))
  }
}
