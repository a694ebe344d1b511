package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming hourly OHLC ≡ batch hourly OHLC on the same rows — the
  * "backfilled bar equals live bar" claim of StreamingJobs.hourlyOhlc
  * (same single-agg min_by/max_by-over-(ts,event_id) shape as
  * Analytics.q43Ohlc).
  */
object StreamOhlcSpec {
  case class EvT(event_id: Long, ts: Timestamp, event_type: String, value: Double)
}

class StreamOhlcSpec extends SparkSpec {
  import spark.implicits._
  import StreamOhlcSpec.EvT

  test("streamed OHLC bars equal batch bars over the same rows") {
    val rnd = new scala.util.Random(43)
    val types = Array("click", "view", "purchase")
    var t = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (1 to 300).map { i =>
      t += rnd.nextInt(20 * 60000) // 0..20 min
      EvT(i.toLong, new Timestamp(t), types(rnd.nextInt(3)),
        math.floor(rnd.nextDouble() * 10000) / 100)
    }
    implicit val sc = spark.sqlContext
    val src = MemoryStream[EvT]
    val q = graft.streaming.StreamingJobs.hourlyOhlc(src.toDF())
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode(OutputMode.Append).start()
    try {
      rows.grouped(70).foreach { g => src.addData(g: _*); q.processAllAvailable() }
      // far-future sentinel pushes the watermark past every real bar
      src.addData(EvT(9999, new Timestamp(t + 7 * 86400000L), "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ohlc_out")
        .filter($"event_type" =!= "flush")
        .select($"event_type", $"h".cast("string"),
          $"open", $"high", $"low", $"close", $"n")
        .as[(String, String, Double, Double, Double, Double, Long)]
        .collect().toSet
      val ord = struct(col("ts"), col("event_id"))
      val batch = rows.toDF()
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(min_by(col("value"), ord).as("open"), max(col("value")).as("high"),
          min(col("value")).as("low"), max_by(col("value"), ord).as("close"),
          count(lit(1)).as("n"))
        .select($"event_type", $"h".cast("string"),
          $"open", $"high", $"low", $"close", $"n")
        .as[(String, String, Double, Double, Double, Double, Long)]
        .collect().toSet
      assert(streamed === batch,
        s"batch-only: ${batch -- streamed}; stream-only: ${streamed -- batch}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
