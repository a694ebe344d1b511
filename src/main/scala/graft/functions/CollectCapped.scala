package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable buffer of [[CollectCapped]]: exact group cardinality + at most
  * `cap + 1` collected values. */
final class CappedBuffer(
    var count: Long,
    val items: scala.collection.mutable.ArrayBuffer[Any])

/** `collect_capped(e, cap)` — collect_list with a HARD buffer bound plus an
  * exact row count, as `struct<f: bigint, ds: array<eType>>`.
  *
  * This is the single-pass engine behind the hot/cold bucket routing of the
  * pair lanes (`Similarity.splitHotBuckets`): the previous design needed a
  * separate count pass (one extra job + a materialization of the input) to
  * learn which keys were viral BEFORE any collect_list buffer could blow up
  * on them. collect_capped answers the same question inside the one
  * aggregation the lane runs anyway: `f` is the exact per-key row count
  * (every row counted, null values counted but not collected — matching
  * `count(lit(1))` + collect_list semantics), while `ds` stops growing at
  * `cap + 1` elements, so a viral key (f = 10⁷ boilerplate docs at 100 TB)
  * costs a 64-bit counter, never a 10⁷-element array, in ANY buffer —
  * map-side partials and merged reducer buffers alike. Keys with
  * `f ≤ cap` have ds complete by construction; keys above the cap carry a
  * truncated ds that callers must ignore and re-derive from raw rows
  * (the salted-join hot path).
  *
  * Like Spark's own Collect aggregates this is a TypedImperativeAggregate
  * (ObjectHashAggregate, non-codegen) — identical execution class to the
  * collect_list it replaces, so no codegen regression. Serde follows the
  * Collect pattern: each element through an UnsafeProjection of the element
  * type, length-prefixed.
  */
case class CollectCapped(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedBuffer] {

  override def prettyName: String = "collect_capped"
  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = false

  private lazy val cap: Long = capExpr.eval().asInstanceOf[Number].longValue()
  // cap+1 clamped — an Int.MaxValue cap (the specs' "uncapped" sentinel)
  // must not overflow to a zero-size keep
  private lazy val keep: Int = (math.min(cap, Int.MaxValue - 1L) + 1L).toInt

  override def checkInputDataTypes(): TypeCheckResult =
    if (!capExpr.foldable ||
        !Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(capExpr.dataType))
      TypeCheckResult.TypeCheckFailure("collect_capped cap must be a foldable integer")
    else if (capExpr.eval() == null || capExpr.eval().asInstanceOf[Number].longValue() < 1)
      TypeCheckResult.TypeCheckFailure("collect_capped cap must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("f", LongType, nullable = false),
    StructField("ds", ArrayType(child.dataType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): CappedBuffer =
    new CappedBuffer(0L, scala.collection.mutable.ArrayBuffer.empty)

  override def update(buf: CappedBuffer, input: InternalRow): CappedBuffer = {
    buf.count += 1L
    if (buf.items.size < keep) {
      val v = child.eval(input)
      if (v != null) buf.items += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(a: CappedBuffer, b: CappedBuffer): CappedBuffer = {
    a.count += b.count
    val room = keep - a.items.size
    if (room > 0) a.items ++= b.items.take(room)
    a
  }

  override def eval(buf: CappedBuffer): Any =
    new GenericInternalRow(Array[Any](buf.count, new GenericArrayData(buf.items.toArray)))

  @transient private lazy val elemProj =
    UnsafeProjection.create(Array[DataType](child.dataType))
  @transient private lazy val elemRow = new GenericInternalRow(1)

  override def serialize(buf: CappedBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    out.writeInt(buf.items.size)
    buf.items.foreach { v =>
      elemRow.update(0, v)
      val row = elemProj(elemRow)
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    val items = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, size)
      items += row.get(0, child.dataType)
      i += 1
    }
    new CappedBuffer(count, items)
  }

  override def withNewMutableAggBufferOffset(offset: Int): CollectCapped =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CollectCapped =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CollectCapped =
    copy(child = newChildren(0), capExpr = newChildren(1))
}
