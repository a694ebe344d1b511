package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Codegen'd dot product over numeric arrays (float[] or double[] per side),
  * accumulating left-to-right in double — the exact fold order of
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
  * 0D, (s,v) -> s+v)`, so results are bit-identical to that formulation and
  * to the DuckDB oracle's `list_reduce(list_prepend(0.0, ...))`.
  *
  * Why a custom Expression (SURVEY.md §2B Q25 bench path): Spark's
  * higher-order functions don't participate in whole-stage codegen — each
  * element evaluation is an interpreted lambda with boxing. For a 64-dim
  * dot inside an O(n²) pair join that's the dominant cost at scale. This
  * tight primitive loop stays inside WholeStageCodegen.
  *
  * Null handling: null arrays propagate null (BinaryExpression default);
  * null *elements* are not expected (embeddings are dense) and would read
  * as 0.0 via ArrayData's primitive getters.
  */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "dotf"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dotf expects array<float|double> args, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      val getA =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $getA * $getB;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of graft's custom Catalyst expressions. */
object GraftFunctions {
  /** Arity-validated bloom_agg builder mirroring Spark's own
    * bloom_filter_agg forms: 1 arg (defaults), 2 (estimated items),
    * 3 (+ num bits). A wrong-arity call gets a clear invalid-arguments
    * error instead of an IndexOutOfBoundsException from `exprs(2)`. */
  private[functions] def bloomAgg(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val agg = exprs match {
      case Seq(c)       => new BloomFilterAggregate(c)
      case Seq(c, n)    => new BloomFilterAggregate(c, n)
      case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
      case _ => throw new IllegalArgumentException(
        s"bloom_agg expects 1 to 3 arguments (value[, estimatedItems[, numBits]]), got ${exprs.length}")
    }
    agg.toAggregateExpression()
  }

  /** 1-arg (raw 60-bit) and 2-arg (reduced mod m) forms. */
  private[functions] def hash60Arr(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a) => Hash60Arr(a,
      org.apache.spark.sql.catalyst.expressions.Literal(Hash60Arr.NoMod))
    case Seq(a, m) => Hash60Arr(a, m)
    case _ => throw new IllegalArgumentException(
      s"hash60_arr expects 1 or 2 arguments (array[, modulus]), got ${exprs.length}")
  }

  private[functions] def bloomContains(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(bloom, value) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bloom, value)
    case _ => throw new IllegalArgumentException(
      s"bloom_contains expects exactly 2 arguments (bloom, value), got ${exprs.length}")
  }

  /** Idempotent: createOrReplaceTempFunction overwrites in place. Registers
    * the WHOLE custom surface (dotf + both minhash sketch aggregates) so a
    * caller never sees a session with half the functions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dotf", exprs => DotF(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash12", exprs => MinHashSig(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pair_expand", exprs => PairExpand(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pair_expand_ids", exprs => PairExpandIds(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "collect_capped",
      exprs => CollectCapped(exprs(0), exprs(1)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "span_hashes", exprs => SpanHashes(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash60_arr", exprs => GraftFunctions.hash60Arr(exprs), "built-in")
    // Stock Catalyst bloom expressions (the machinery behind Spark's own
    // runtime row-level filtering), surfaced as callable functions so a
    // query can build an explicit broadcast-prefilter plan: `bloom_agg`
    // collapses a huge key set to one binary bitset row; `bloom_contains`
    // probes it row-local (bloom side must be foldable or a scalar
    // subquery — BloomFilterMightContain.checkInputDataTypes enforces it).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", exprs => GraftFunctions.bloomAgg(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains", exprs => GraftFunctions.bloomContains(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_centroid", exprs => NearestCentroid.fromExprs(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_avg", exprs => VecAvg(exprs.head).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_len", exprs => DeflateLen(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_pos", exprs => TokenizePos(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch",
      exprs => FreqSketch(exprs(0), exprs(1)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmin2",
      exprs => ArgExtremum(exprs(0), exprs(1), exprs(2), findMin = true)
        .toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmax2",
      exprs => ArgExtremum(exprs(0), exprs(1), exprs(2), findMin = false)
        .toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pack_sorted_longs", exprs => PackSortedLongs(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "intersect_packed",
      exprs => IntersectPackedLongs(exprs(0), exprs(1)), "built-in")
    MinHashSketch.register(spark)
  }
}

/** `SparkSessionExtensions` hook — the deployment-grade registration path:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // code
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions // submit
  * }}}
  * makes `dotf` available to every session (including pure `spark.sql`)
  * without any imperative register call. Two optimizer rules are injected —
  * [[graft.plans.ApproxDistinctRule]], the conf-gated (default OFF)
  * COUNT(DISTINCT)→HLL policy rewrite, and [[TryCastFastPathRule]], the
  * conf-gated (default ON, semantics-identical) non-throwing TRY_CAST
  * string→integral fast path; beyond those the engine's whole surface
  * plans through stock Catalyst (SURVEY §4), expressions being the only
  * other custom Catalyst artifacts on the default path.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    // the injectOptimizerRule leg: the opt-in COUNT(DISTINCT)->HLL policy
    // rewrite (graft.plans.ApproxDistinctRule; default OFF, conf-gated)
    e.injectOptimizerRule(_ => new graft.plans.ApproxDistinctRule)
    // the non-throwing TRY_CAST(string AS INT/BIGINT) fast path (default
    // ON, conf-gated) — semantics-identical to stock TRY cast, minus the
    // per-invalid-row JVM exception (TryCastFast.scala; TryCastFastSpec)
    e.injectOptimizerRule(_ => new TryCastFastPathRule)
    // the injectPlannerStrategy leg: the TopKPerKey whole-operator plan
    // (graft.plans.TopKStrategy; matches only the custom logical node, so
    // every other plan is untouched)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // the injectParser leg: the GRAFT VACUUM VERSIONS maintenance command
    // (graft.plans.GraftSqlParser; everything else delegates verbatim)
    e.injectParser((_, parser) => new graft.plans.GraftSqlParser(parser))
    e.injectFunction((
      FunctionIdentifier("dotf"),
      new ExpressionInfo(classOf[DotF].getName, "dotf"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotF(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("minhash12"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash12"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSig(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash60(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("pair_expand"),
      new ExpressionInfo(classOf[PairExpand].getName, "pair_expand"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PairExpand(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("pair_expand_ids"),
      new ExpressionInfo(classOf[PairExpandIds].getName, "pair_expand_ids"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PairExpandIds(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("collect_capped"),
      new ExpressionInfo(classOf[CollectCapped].getName, "collect_capped"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CollectCapped(exprs(0), exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("span_hashes"),
      new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SpanHashes(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hash60_arr"),
      new ExpressionInfo(classOf[Hash60Arr].getName, "hash60_arr"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.hash60Arr(exprs)))
    e.injectFunction((
      FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSketch(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("minhash_sketch_merge"),
      new ExpressionInfo(classOf[MinHashSketchMerge].getName, "minhash_sketch_merge"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSketchMerge(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.bloomAgg(exprs)))
    e.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.bloomContains(exprs)))
    e.injectFunction((
      FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NearestCentroid.fromExprs(exprs)))
    e.injectFunction((
      FunctionIdentifier("vec_avg"),
      new ExpressionInfo(classOf[VecAvg].getName, "vec_avg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecAvg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DeflateLen(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("tokenize_pos"),
      new ExpressionInfo(classOf[TokenizePos].getName, "tokenize_pos"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenizePos(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "freq_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FreqSketch(exprs(0), exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("argmin2"),
      new ExpressionInfo(classOf[ArgExtremum].getName, "argmin2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArgExtremum(exprs(0), exprs(1), exprs(2), findMin = true)
          .toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("argmax2"),
      new ExpressionInfo(classOf[ArgExtremum].getName, "argmax2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArgExtremum(exprs(0), exprs(1), exprs(2), findMin = false)
          .toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("pack_sorted_longs"),
      new ExpressionInfo(classOf[PackSortedLongs].getName, "pack_sorted_longs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PackSortedLongs(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("intersect_packed"),
      new ExpressionInfo(classOf[IntersectPackedLongs].getName, "intersect_packed"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IntersectPackedLongs(exprs(0), exprs(1))))
  }
}
