package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Delta-varint packing for SORTED long arrays — the shuffle-byte diet for
  * adjacency-shaped payloads (SURVEY §2I q62; VERDICT r11 task 5).
  *
  * The q62 closing join ships each oriented edge's N⁺(u) array through the
  * v-shuffle, so its communication volume is the wedge population in bytes:
  * Σ_u outdeg(u)·(16 + 8·outdeg(u)) with UnsafeArrayData's 8 B/element plus
  * header — measured ~84 GB raw for one 128× pass. A sorted adjacency list
  * is gap-compressible: `pack_sorted_longs` stores the first id zigzag-varint
  * and every successor as a plain-varint GAP, so a neighbor costs 1–3 bytes
  * on any id universe where neighbors cluster (co-occurrence graphs, per-copy
  * key offsets) instead of a flat 8 — a 3–5× raw-byte cut on the dominant
  * shuffle of the lane, BEFORE wire compression sees it.
  *
  * `intersect_packed` merge-walks two packed streams directly — no
  * intermediate array materialization, no hash-set build — and emits the
  * ascending intersection as `array<bigint>`. For strictly-increasing inputs
  * (deduplicated adjacency lists; `pack_sorted_longs` REJECTS unsorted input
  * loudly rather than emit a stream the merge would silently mis-walk) the
  * result is set-identical to `array_intersect(a, b)`; element order differs
  * (ascending vs left-operand order), which every in-repo consumer is
  * insensitive to (size / explode→groupBy-sum).
  *
  * CodegenFallback for the [[PairExpand]] reason: the loop bodies are
  * compiled Scala on a per-row-dominant path; falling out of whole-stage
  * codegen for the projection costs less than interpreted per-element
  * dispatch would.
  */
case class PackSortedLongs(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "pack_sorted_longs"

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_sorted_longs expects array<bigint>, got ${t.sql}")
  }

  override protected def nullSafeEval(dsAny: Any): Any = {
    val ds = dsAny.asInstanceOf[ArrayData]
    val n = ds.numElements()
    // worst case: 10 varint bytes per element (zigzag first, gaps after)
    val buf = new Array[Byte](n * 10)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      if (ds.isNullAt(i))
        throw new IllegalArgumentException(
          "pack_sorted_longs: null element; pack deduplicated non-null lists")
      val v = ds.getLong(i)
      // first element zigzag (ids may be any long); gaps plain varint —
      // non-negative by the sortedness contract, enforced here because a
      // negative gap would decode as garbage downstream
      var u =
        if (i == 0) (v << 1) ^ (v >> 63)
        else {
          // STRICTLY ascending (r12 ADVICE): an equal successor (gap 0)
          // used to pack silently, and intersect_packed would then emit
          // duplicates — diverging from array_intersect's set semantics
          // the scaladoc promises. The function is SQL-registered, so the
          // contract must hold for arbitrary callers, not just q62's
          // distinct-edge adjacency.
          if (v <= prev) throw new IllegalArgumentException(
            s"pack_sorted_longs: input not strictly ascending ($prev then $v); " +
              "sort_array(array_distinct(..)) the list before packing")
          v - prev
        }
      prev = v
      while ((u & ~0x7FL) != 0L) {
        buf(pos) = ((u & 0x7F) | 0x80).toByte
        pos += 1
        u >>>= 7
      }
      buf(pos) = u.toByte
      pos += 1
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  override protected def withNewChildInternal(newChild: Expression): PackSortedLongs =
    copy(child = newChild)
}

/** Ascending intersection of two [[PackSortedLongs]] streams — see that
  * class's doc for the contract and the shuffle-byte rationale. */
case class IntersectPackedLongs(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "intersect_packed"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"intersect_packed expects (binary, binary), got ${l.sql}, ${r.sql}")
  }

  override protected def nullSafeEval(lAny: Any, rAny: Any): Any = {
    val a = lAny.asInstanceOf[Array[Byte]]
    val b = rAny.asInstanceOf[Array[Byte]]
    if (a.length == 0 || b.length == 0) return new GenericArrayData(Array.empty[Any])
    // inline varint cursors: (position, running value) per stream
    var pa = 0; var va = 0L
    var pb = 0; var vb = 0L
    // truncated-stream guard (r12 ADVICE): the function is SQL-registered,
    // so any binary can reach it — a continuation bit pointing past the
    // buffer must fail diagnosably, not as a raw AIOOBE or silent garbage
    def truncated(): Nothing = throw new IllegalArgumentException(
      "intersect_packed: truncated varint stream — input is not a " +
        "pack_sorted_longs binary")
    // decode one varint from `a` at pa; returns raw varint, advances pa
    def nextA(): Long = {
      var u = 0L; var shift = 0
      if (pa >= a.length) truncated()
      var byte = a(pa); pa += 1
      while ((byte & 0x80) != 0) {
        u |= (byte & 0x7FL) << shift; shift += 7
        if (pa >= a.length) truncated()
        byte = a(pa); pa += 1
      }
      u | ((byte & 0x7FL) << shift)
    }
    def nextB(): Long = {
      var u = 0L; var shift = 0
      if (pb >= b.length) truncated()
      var byte = b(pb); pb += 1
      while ((byte & 0x80) != 0) {
        u |= (byte & 0x7FL) << shift; shift += 7
        if (pb >= b.length) truncated()
        byte = b(pb); pb += 1
      }
      u | ((byte & 0x7FL) << shift)
    }
    // first elements are zigzag; the rest are gaps added to the running value
    val za = nextA(); va = (za >>> 1) ^ -(za & 1)
    val zb = nextB(); vb = (zb >>> 1) ^ -(zb & 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var done = false
    while (!done) {
      if (va == vb) {
        out += va
        if (pa < a.length && pb < b.length) { va += nextA(); vb += nextB() }
        else done = true
      } else if (va < vb) {
        if (pa < a.length) va += nextA() else done = true
      } else {
        if (pb < b.length) vb += nextB() else done = true
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectPackedLongs =
    copy(left = newLeft, right = newRight)
}
