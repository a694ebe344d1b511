package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `hash60_arr(arr[, m])` — the engine's 60-bit md5 hash applied to every
  * element of a string array in ONE compiled loop, optionally reduced
  * `% m`. Replaces the `transform(arr, s -> conv(substr(md5(s),1,15),16,10)
  * [% m])` formulation on the hash-heavy lanes (minhash bands, simhash
  * token hashes): the lambda form is interpreted per element AND computes
  * the digest via a hex STRING round trip (md5 → 32-char hex → substr →
  * conv parse); this loop digests numerically (graft.functions.Hash60,
  * thread-local MessageDigest) — bit-identical values, proven by
  * Hash60ArrSpec against the SQL formulation, so every DuckDB oracle
  * stays valid unchanged.
  *
  * Null semantics mirror the SQL form exactly: a null ARRAY yields null
  * (BinaryExpression default); a null ELEMENT yields a null element
  * (md5(NULL) is NULL through the conv chain).
  *
  * CodegenFallback: the md5 digest dominates; the loop body is compiled
  * Scala either way.
  */
case class Hash60Arr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "hash60_arr"

  override def dataType: DataType = left.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType)
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), LongType | IntegerType) if right.foldable =>
      val m = right.eval()
      if (m == null || m.asInstanceOf[Number].longValue() < 1)
        TypeCheckResult.TypeCheckFailure("hash60_arr modulus must be a positive literal")
      else TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"hash60_arr expects (array<string>, positive integral literal), got ${l.sql}, ${r.sql}")
  }

  @transient private lazy val m: Long = right.eval().asInstanceOf[Number].longValue()

  override protected def nullSafeEval(arrAny: Any, mAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      out(i) = if (s == null) null else {
        val h = Hash60(s.getBytes)
        if (m == NoMod) h else h % m
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  private val NoMod = Hash60Arr.NoMod

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Hash60Arr =
    copy(left = newLeft, right = newRight)
}

object Hash60Arr {
  /** Sentinel modulus meaning "no reduction" — larger than any 60-bit
    * value, so `h % NoMod == h`; used by the 1-arg SQL form. */
  val NoMod: Long = 1L << 62
}
