package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
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
    val n = ds.numElements()
    val ids = new Array[Long](n)
    val sizes = new Array[Int](n)
    var i = 0
    while (i < n) {
      val row = ds.getStruct(i, 2)
      ids(i) = row.getLong(0)
      sizes(i) = row.getInt(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    i = 0
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
