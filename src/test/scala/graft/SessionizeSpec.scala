package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.queries.Analytics

/** q34_sessionize: the batch `session_window` lane.
  *
  * Three claims:
  *  1. boundary semantics — events EXACTLY one gap apart merge (the merge
  *     condition is `start <= end`), one microsecond past the gap splits.
  *     The DuckDB oracle's strict `> INTERVAL` break hinges on this pin.
  *  2. batch ≡ stream — the same operator over the same rows produces the
  *     same sessions whether run as one batch or as an arbitrary
  *     micro-batched stream (the "backfill never drifts from live" claim).
  *  3. lane invariants on real data — sessions partition the events and
  *     are maximal (consecutive sessions of a user never touch).
  */
object SessionizeSpec {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long)
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import SessionizeSpec.Ev
  private def ts(s: String) = Timestamp.valueOf(s)

  private def batchSessions(rows: Seq[Ev], gap: String) =
    rows.toDF()
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"sw.start".as("s_start"), $"sw.end".as("s_end"), $"n")

  test("boundary pin: exactly-gap merges, gap+1us splits") {
    val rows = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 1),
      Ev(2, ts("2024-01-01 04:00:00"), 1),          // exactly 4h → merges
      Ev(3, ts("2024-01-02 00:00:00"), 2),
      Ev(4, ts("2024-01-02 04:00:00.000001"), 2))    // 4h + 1us → splits
    val out = batchSessions(rows, "4 hours")
      .select($"user_id", $"n").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("batch sessionization equals streamed sessionization on the same rows") {
    val rnd = new scala.util.Random(47)
    // 150 events for 6 users with inter-arrival straddling the 30m gap
    var t = ts("2024-01-01 00:00:00").getTime
    val rows = (1 to 150).map { i =>
      t += (rnd.nextInt(55) + 1) * 60000L // 1..55 minutes
      Ev(i.toLong, new Timestamp(t), (i % 6).toLong)
    }
    implicit val sc = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = graft.streaming.StreamingJobs.sessionCounts(src.toDF())
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode(OutputMode.Append).start()
    try {
      // arbitrary micro-batch topology: 3 uneven slices, then a far-future
      // sentinel to push the watermark past everything and flush all state
      rows.grouped(40).foreach { g => src.addData(g: _*); q.processAllAvailable() }
      src.addData(Ev(9999, new Timestamp(t + 86400000L), 999))
      q.processAllAvailable()
      val streamed = spark.table("sess_parity")
        .filter($"user_id" =!= 999)
        .select($"user_id", $"s_start".cast("string"), $"s_end".cast("string"), $"n")
        .as[(Long, String, String, Long)].collect().toSet
      val batch = batchSessions(rows, "30 minutes")
        .select($"user_id", $"s_start".cast("string"), $"s_end".cast("string"), $"n")
        .as[(Long, String, String, Long)].collect().toSet
      assert(streamed === batch,
        s"batch-only: ${batch -- streamed}; stream-only: ${streamed -- batch}")
    } finally q.stop()
  }

  test("lane invariants: sessions partition events and are maximal") {
    val out = Analytics.q34Sessionize(spark, sf001).collect()
    val nEvents = graft.core.Tables.events(spark, sf001).count()
    assert(out.map(_.getAs[Long]("n_events")).sum === nEvents)
    // dur_us = observed span + the 4h gap ⇒ every session is ≥ 4h long
    assert(out.forall(_.getAs[Long]("dur_us") >= 4L * 3600 * 1000000))
    // maximality: consecutive sessions of a user never touch — the next
    // session's first event is strictly past this session's end (else the
    // two would have merged under the `start <= end` rule)
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      // Timestamp.getTime is millis — compareTo keeps the micros
      val sorted = ss.sortWith((a, b) =>
        a.getAs[Timestamp]("s_start").compareTo(b.getAs[Timestamp]("s_start")) < 0)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Timestamp]("s_start")
            .compareTo(a.getAs[Timestamp]("s_end")) > 0)
        case _ => ()
      }
    }
  }
}
