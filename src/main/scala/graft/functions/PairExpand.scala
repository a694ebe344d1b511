package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Posting-list pair expansion with the exactness-preserving size-ratio
  * prune, as one tight loop: input `array<struct<doc_id: bigint, n: int>>`
  * (a shingle's postings carrying doc sizes) and the Jaccard threshold;
  * output every i<j pair passing `min(nᵃ,nᵇ) ≥ t·max(nᵃ,nᵇ)` as
  * `struct(doc_a, doc_b, n_sum)` with the ids canonically ordered.
  *
  * Replaces a `flatten(transform(filter(slice(...))))` nest — four levels
  * of interpreted lambda dispatch and a closure invocation per CANDIDATE
  * pair, on the engine's hottest path (Σ freq² pairs). CodegenFallback:
  * the loop body is compiled Scala; pair generation cost is allocation +
  * two comparisons per pair either way, so falling out of whole-stage
  * codegen for this one projection costs less than the lambda dispatch it
  * removes (measured on q24_jaccard_pairs). Arithmetic is identical to
  * the SQL form: the prune compares `min.toDouble >= t * max` with the
  * same int→double promotions.
  */
case class PairExpand(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "pair_expand"

  private val outStruct = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("n_sum", IntegerType, nullable = false)))

  override def dataType: DataType = ArrayType(outStruct, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StructType(fields), _), DoubleType)
      if fields.length == 2 && fields(0).dataType == LongType &&
        fields(1).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pair_expand expects (array<struct<bigint,int>>, double), got ${l.sql}, ${r.sql}")
  }

  override protected def nullSafeEval(dsAny: Any, tAny: Any): Any = {
    val ds = dsAny.asInstanceOf[ArrayData]
    val t = tAny.asInstanceOf[Double]
    val m = ds.numElements()
    val ids = new Array[Long](m)
    val sizes = new Array[Int](m)
    // Null elements are skipped, matching the SQL nest this replaces
    // (its filter() lambda drops nulls before pairing).
    var n = 0
    var k0 = 0
    while (k0 < m) {
      val row = ds.getStruct(k0, 2)
      if (row != null) {
        ids(n) = row.getLong(0)
        sizes(n) = row.getInt(1)
        n += 1
      }
      k0 += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val na = sizes(i); val nb = sizes(j)
        val mn = if (na < nb) na else nb
        val mx = if (na < nb) nb else na
        if (mn.toDouble >= t * mx) {
          val a = ids(i); val b = ids(j)
          out += new GenericInternalRow(Array[Any](
            if (a < b) a else b, if (a < b) b else a, na + nb))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PairExpand =
    copy(left = newLeft, right = newRight)
}

/** The no-prune sibling of [[PairExpand]] for the banded-bucket lanes
  * (q24_lsh_pairs, q24_simhash_pairs), whose cold branches expand EVERY
  * i<j pair of a bucket's posting list — there is no size-ratio prune to
  * apply, but the interpreted `flatten(transform(transform(slice(...))))`
  * nest costs the same four levels of lambda dispatch per candidate pair.
  *
  * Input shape picks the output:
  *   - `array<bigint>` → `array<struct<doc_a, doc_b>>` (ids canonically
  *     ordered) — the BARE-ID case (r14, the basket lanes: a struct wrapper
  *     around one long costs an UnsafeRow object per collected element in
  *     the capped-collect buffers — 2-3× the heap of a boxed long across
  *     tens of millions of elements, the margin between passing and OOM at
  *     the 128× rehearsal);
  *   - `array<struct<doc_id: bigint>>` → `array<struct<doc_a, doc_b>>`
  *     (ids canonically ordered) — the LSH band-bucket case;
  *   - `array<struct<doc_id: bigint, simhash: bigint>>` →
  *     `array<struct<doc_a, doc_b, hamming: int>>` with
  *     `hamming = bit_count(simhashᵃ XOR simhashᵇ)` — the SimHash case.
  *     `Long.bitCount` is the exact semantics of SQL `bit_count` on
  *     BIGINT, so values are bit-identical to the lambda formulation.
  *
  * CodegenFallback for the same measured reason as [[PairExpand]]: the
  * loop body is compiled Scala and dominates the projection cost.
  */
case class PairExpandIds(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "pair_expand_ids"

  /** 0 = bare bigint elements; 1/2 = struct payload field count. */
  private def payloadFields: Int = child.dataType match {
    case ArrayType(StructType(fields), _) => fields.length
    case _ => 0
  }

  override def dataType: DataType = {
    val base = Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))
    val fields =
      if (payloadFields == 2) base :+ StructField("hamming", IntegerType, nullable = false)
      else base
    ArrayType(StructType(fields), containsNull = false)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StructType(fields), _)
      if fields.length == 1 && fields(0).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StructType(fields), _)
      if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pair_expand_ids expects array<bigint> or array<struct<bigint[, bigint]>>, got ${t.sql}")
  }

  override protected def nullSafeEval(dsAny: Any): Any = {
    val ds = dsAny.asInstanceOf[ArrayData]
    val bare = payloadFields == 0
    val withHam = payloadFields == 2
    val m = ds.numElements()
    val ids = new Array[Long](m)
    val pay = if (withHam) new Array[Long](m) else null
    // Null elements are skipped (the lambda nest this replaces filtered
    // them out); in-repo callers feed containsNull=false postings.
    var n = 0
    var i = 0
    while (i < m) {
      if (bare) {
        if (!ds.isNullAt(i)) { ids(n) = ds.getLong(i); n += 1 }
      } else {
        val row = ds.getStruct(i, payloadFields)
        if (row != null) {
          ids(n) = row.getLong(0)
          if (withHam) pay(n) = row.getLong(1)
          n += 1
        }
      }
      i += 1
    }
    // n*(n-1)/2 must fit one JVM array: past ~65k elements the Int
    // product wraps negative. In-repo lanes are bounded by cap+1 long
    // before this, so the guard only trips for external SQL callers —
    // fail loudly rather than allocate a corrupted size.
    val pairCount = n.toLong * (n - 1) / 2
    if (pairCount > Int.MaxValue)
      throw new IllegalArgumentException(
        s"pair_expand_ids: $n elements would expand to $pairCount pairs, " +
          "exceeding the max array size; cap the posting list before expanding")
    val out = new Array[InternalRow](pairCount.toInt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = ids(i); val b = ids(j)
        val lo = if (a < b) a else b
        val hi = if (a < b) b else a
        out(k) =
          if (withHam)
            new GenericInternalRow(Array[Any](lo, hi,
              java.lang.Long.bitCount(pay(i) ^ pay(j))))
          else new GenericInternalRow(Array[Any](lo, hi))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PairExpandIds =
    copy(child = newChild)
}
