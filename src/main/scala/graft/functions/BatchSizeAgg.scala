package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.core.ApiLimitCalculator

/** Typed `Aggregator[IN, BUF, OUT]` (the declared UDAF surface, SURVEY §2B):
  * one-pass batch-size statistics feeding the R7 limit calibration
  * (`util.py:43-85`) — per group: row count, total/max serialized bytes and
  * the suggested next API limit for a 16 MB·0.5 target.
  *
  * Merge is associative/commutative (sums and max), so Spark computes it
  * map-side partial + final — the distributed replacement for the
  * reference's single probe request (`CommCareAPIHandler.py:142-156`),
  * which estimated from one page what this measures exactly in one pass.
  */
object BatchSizeAgg {
  final case class Buf(count: Long, totalBytes: Long, maxBytes: Long)
  final case class Stats(count: Long, totalBytes: Long, maxBytes: Long,
                         avgBytes: Double, suggestedLimit: Int)

  val agg: Aggregator[Long, Buf, Stats] = new Aggregator[Long, Buf, Stats] {
    override def zero: Buf = Buf(0L, 0L, 0L)
    override def reduce(b: Buf, rowBytes: Long): Buf =
      Buf(b.count + 1, b.totalBytes + rowBytes, math.max(b.maxBytes, rowBytes))
    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.count + b.count, a.totalBytes + b.totalBytes, math.max(a.maxBytes, b.maxBytes))
    override def finish(b: Buf): Stats = {
      val avg = if (b.count == 0) 0.0 else b.totalBytes.toDouble / b.count
      // observed bytes for a `count`-row batch → next limit (util.py:75-85)
      val suggested =
        if (b.totalBytes == 0) ApiLimitCalculator.MaxLimit
        else ApiLimitCalculator.newLimit(b.count.toInt, b.totalBytes)
      Stats(b.count, b.totalBytes, b.maxBytes, avg, suggested)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
