package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `freq_sketch(item, k)` — Misra-Gries heavy-hitters summary as a
  * mergeable `TypedImperativeAggregate`: ≤ k counters per group, ONE pass,
  * with the classic deterministic guarantees (FreqSketchSpec proves all
  * three across merge topologies):
  *
  *  - underestimate only:   est(x) ≤ true(x)
  *  - bounded error:        true(x) − est(x) ≤ n / (k+1)   (n = group size)
  *  - guaranteed presence:  true(x) > n/(k+1) ⇒ x is in the summary
  *
  * Update is textbook MG: hit → +1; room → insert at 1; full → decrement
  * every counter (dropping zeros), charging the arriving item and k
  * resident ones together. Merge is the Agarwal et al. "Mergeable
  * Summaries" rule: pointwise-sum the two summaries, then subtract the
  * (k+1)-st largest count from every entry and keep the positive ones —
  * associative-in-bound (any merge tree preserves the n/(k+1) error), so
  * map-side partial aggregation applies and a group's summary costs one
  * pass at any scale. That is the 100 TB top-k lever: exact per-token
  * counts over a 10¹²-token corpus need a full vocabulary shuffle
  * (q23_top_terms' shape); this needs k counters per partition and ships
  * k rows per group, at the price of the deterministic error band above —
  * the frequency-sketch sibling of q13's HLL and q34's percentile
  * sketches.
  *
  * Output: `array<struct<item string, est bigint>>` sorted (est desc,
  * item asc) — deterministic GIVEN the summary; the summary itself is
  * merge-order-dependent inside the error band, so consuming lanes are
  * rows-only by design (like every sketch lane).
  */
case class FreqSketch(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def prettyName: String = "freq_sketch"
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (StringType, IntegerType | LongType) if kExpr.foldable =>
        val k = kExpr.eval()
        if (k == null || k.asInstanceOf[Number].longValue() < 1)
          TypeCheckResult.TypeCheckFailure("freq_sketch k must be a positive literal")
        else TypeCheckResult.TypeCheckSuccess
      case (c, kd) => TypeCheckResult.TypeCheckFailure(
        s"freq_sketch expects (string, positive integral literal), got ${c.sql}, ${kd.sql}")
    }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None => // full: the arriving item and one unit of each counter cancel
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-st largest count from everything, keep positives:
      // value-based, so no tie-breaking choice exists to get wrong
      val cut = a.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(item), est))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + bytes.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), sb) =>
      bb.putInt(sb.length); bb.put(sb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
