package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** StreamingJobs.incidentDetect — live incident windows ≡ the batch
  * islands at the same threshold. Drives a deterministic traffic shape
  * through MemoryStream: two isolated hot hours, one 3-hour hot RUN, and
  * hot hours separated by a cold hour (must NOT chain), then checks the
  * emitted incidents against hand-derived windows AND against the batch
  * gaps-and-islands arithmetic on the same rows. Also the chained-
  * stateful-operator probe: hourly tumbling aggregation feeding a
  * session_window aggregation in ONE query (Spark multi-stateful
  * support) — if a Spark upgrade drops it, this spec is the tripwire. */
object IncidentStreamSpec {
  case class EvI(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
}

class IncidentStreamSpec extends SparkSpec {
  import spark.implicits._
  import IncidentStreamSpec.EvI

  private val H = 3600000L
  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  // events per hour offset: >3/hour is hot at threshold 3
  private val traffic: Map[Int, Int] = Map(
    0 -> 2,            // cold
    1 -> 5,            // hot, isolated
    3 -> 6, 4 -> 4, 5 -> 7, // hot run of three -> ONE incident
    7 -> 4,            // hot
    8 -> 1,            // cold gap
    9 -> 5)            // hot again -> separate incident

  private def rows: Seq[EvI] = {
    var id = 0L
    traffic.toSeq.sortBy(_._1).flatMap { case (h, n) =>
      (0 until n).map { i =>
        id += 1
        EvI(id, new Timestamp(base + h * H + i * 60000L), id % 7, 1.0)
      }
    }
  }

  test("streamed incidents equal the batch islands at the same threshold") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[EvI]
    val q = graft.streaming.StreamingJobs.incidentDetect(src.toDF(), threshold = 3L)
      .writeStream.format("memory").queryName("incidents_out")
      .outputMode(OutputMode.Append).start()
    try {
      rows.grouped(8).foreach { g => src.addData(g: _*); q.processAllAvailable() }
      // sentinel far past everything closes all sessions
      src.addData(EvI(9999L, new Timestamp(base + 400 * H), 1L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("incidents_out")
        .select($"w_start".cast("string"), $"w_end".cast("string"), $"n_hot_hours")
        .as[(String, String, Long)].collect().toSet

      def ts(hOff: Double) = new Timestamp(base + (hOff * H).toLong).toString
        .stripSuffix(".0")
      val want = Set(
        (ts(0.5), ts(2.5), 1L),   // hour 1 alone
        (ts(2.5), ts(6.5), 3L),   // hours 3-5 chained
        (ts(6.5), ts(8.5), 1L),   // hour 7 (hour 8 cold breaks the chain)
        (ts(8.5), ts(10.5), 1L))  // hour 9
      assert(streamed == want, s"streamed $streamed\nwant $want")

      // cross-check against the batch gaps-and-islands arithmetic
      val hot = rows.toDF()
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 3)
      val isl = hot
        .withColumn("grp",
          (unix_micros(col("hr")) / lit(3600000000L)).cast("long")
            - row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("hr"))))
        .groupBy(col("grp"))
        .agg(min(col("hr")).as("s"), max(col("hr")).as("e"), count(lit(1)).as("nh"))
        .select(
          (col("s") - expr("INTERVAL 30 MINUTES")).cast("string"),
          (col("e") + expr("INTERVAL 90 MINUTES")).cast("string"),
          col("nh"))
        .as[(String, String, Long)].collect().toSet
      assert(streamed == isl, s"streamed $streamed\nbatch islands $isl")
    } finally q.stop()
  }
}
