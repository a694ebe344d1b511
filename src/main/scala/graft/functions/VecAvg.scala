package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean over numeric-array rows (`vec_avg(embedding)` →
  * `array<double>`) — the centroid reduce of every embedding pipeline
  * (IVF Lloyd steps, cluster means, semantic-dedup prototypes).
  *
  * Buffer layout is one flat `double[]`: `[count, sum₀, …, sum_{d-1}]`,
  * sized lazily from the first row (vector width is a data property, not a
  * plan property). Merge is element-wise add — associative and commutative,
  * so map-side partial aggregation applies and a group's centroid costs one
  * corpus pass with only `partitions × groups` buffers crossing the
  * Exchange at any scale. Division by count happens once at eval.
  *
  * Why imperative instead of `d` separate avg() columns: a dims-wide
  * declarative agg builds a ~4d-expression plan whose analysis/codegen time
  * dwarfs its task time at small scale and whose generated method size
  * grows with d; one typed buffer keeps the plan O(1) in the vector width.
  * (Pathology note: like every TypedImperativeAggregate it rides
  * ObjectHashAggregate outside whole-stage codegen — fine here because
  * rows-in = rows-scanned exactly once, there is no exploded stream.)
  *
  * Rows where the array is null are ignored; an all-null (or empty) group
  * evaluates to null. Mixed lengths within a group sum over the shorter
  * prefix of the buffer vs the row (embeddings are fixed-width in
  * practice; the guard just keeps the aggregate total).
  */
case class VecAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def prettyName: String = "vec_avg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_avg expects array<float|double>, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](d + 1) else buf
    b(0) += 1d
    val n = math.min(d, b.length - 1)
    var i = 0
    while (i < n) {
      b(i + 1) += (if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty || buf(0) == 0d) return null
    val cnt = buf(0)
    val out = new Array[Double](buf.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buf(i + 1) / cnt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecAvg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecAvg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecAvg =
    copy(child = newChildren.head)
}
