package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StatefulProcessors

/** t1 coverage for the transformWithState surface (Q42): per-key state
  * accumulates across micro-batches, emits update-mode rows, and runs on
  * the RocksDB provider (the only one the operator supports). */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long)

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("Q42: running counts accumulate per key across micro-batches") {
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try {
      val src = MemoryStream[Ev]
      val q = StatefulProcessors.runningCounts(src.toDF())
        .writeStream.format("memory").queryName("q42_out")
        .outputMode(OutputMode.Update).start()
      try {
        src.addData(
          Ev(1, ts("2024-01-01 00:00:10"), 1),
          Ev(2, ts("2024-01-01 00:00:20"), 1),
          Ev(3, ts("2024-01-01 00:00:30"), 2))
        q.processAllAvailable()
        // batch 2: user 1 gains one more, user 3 appears
        src.addData(
          Ev(4, ts("2024-01-01 00:01:10"), 1),
          Ev(5, ts("2024-01-01 00:01:20"), 3))
        q.processAllAvailable()
      } finally q.stop()
      // update mode: one row per touched key per batch — the LAST row per
      // key is its running total
      val out = spark.table("q42_out").as[(Long, Long)].collect()
      val last = out.zipWithIndex.groupBy(_._1._1)
        .map { case (k, rows) => k -> rows.maxBy(_._2)._1._2 }
      assert(last === Map(1L -> 3L, 2L -> 1L, 3L -> 1L), s"got ${out.toSeq}")
      // batch-1 emission for user 1 was the then-current total, proving the
      // emitted rows are per-batch snapshots, not replays
      assert(out.contains((1L, 2L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("Q42d: MapState keeps per-sub-key counts, updating only touched entries") {
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try {
      val src = MemoryStream[(Long, String)]
      val q = StatefulProcessors.typeBreakdown(
          src.toDF().toDF("user_id", "event_type"))
        .writeStream.format("memory").queryName("q42d_out")
        .outputMode(OutputMode.Update).start()
      try {
        src.addData((1L, "view"), (1L, "view"), (1L, "click"), (2L, "view"))
        q.processAllAvailable()
        // batch 2 touches only user 1's "view" — "click" must persist
        // untouched and not re-emit
        src.addData((1L, "view"))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("q42d_out").as[(Long, String, Long)].collect()
      val last = out.zipWithIndex.groupBy(r => (r._1._1, r._1._2))
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1._3 }
      assert(last === Map((1L, "view") -> 3L, (1L, "click") -> 1L,
        (2L, "view") -> 1L), s"got ${out.toSeq}")
      // the second batch emitted ONLY the touched (1, view) pair
      assert(out.count { case (u, t, _) => u == 1L && t == "click" } === 1)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("Q42e: ListState keeps a capped last-K trail across batches") {
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try {
      val src = MemoryStream[(Long, Long)]
      val q = StatefulProcessors.recentTrails(
          src.toDF().toDF("user_id", "event_id"), k = 3)
        .writeStream.format("memory").queryName("q42e_out")
        .outputMode(OutputMode.Update).start()
      try {
        src.addData((1L, 101L), (1L, 102L))
        q.processAllAvailable()
        // crossing the cap drops the OLDEST entries, keeps arrival order
        src.addData((1L, 103L), (1L, 104L))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("q42e_out").as[(Long, String)].collect()
      assert(out.toSet === Set((1L, "101,102"), (1L, "102,103,104")),
        s"got ${out.toSeq}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("Q42c: event-time timers close inactivity sessions when the watermark passes") {
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try {
      val src = MemoryStream[Ev]
      // 60 s gap
      val q = StatefulProcessors.inactivitySessions(src.toDF(), gapMs = 60000L)
        .writeStream.format("memory").queryName("q42c_out")
        .outputMode(OutputMode.Append).start()
      try {
        // user 1: two events 20 s apart — one session once quiet
        src.addData(
          Ev(1, ts("2024-01-01 00:00:10"), 1),
          Ev(2, ts("2024-01-01 00:00:30"), 1))
        q.processAllAvailable()
        assert(spark.table("q42c_out").count() === 0, "nothing closes before the gap")
        // user 2 far in the future: watermark jumps past user 1's
        // last-activity+gap (00:01:30) → user 1's timer fires, session closes
        src.addData(Ev(3, ts("2024-01-01 00:10:00"), 2))
        q.processAllAvailable()
        val afterJump = spark.table("q42c_out").as[(Long, Long)].collect().toSet
        assert(afterJump === Set((1L, 2L)), s"got $afterJump")
        // user 2 closes once the watermark passes ITS gap; a re-armed key
        // does not double-emit
        src.addData(Ev(4, ts("2024-01-01 00:30:00"), 3))
        q.processAllAvailable()
        val finalRows = spark.table("q42c_out").as[(Long, Long)].collect().toSet
        assert(finalRows === Set((1L, 2L), (2L, 1L)), s"got $finalRows")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("Q42c: a batch of only out-of-order rows never moves the timer backward") {
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try {
      val src = MemoryStream[Ev]
      val q = StatefulProcessors.inactivitySessions(src.toDF(), gapMs = 60000L)
        .writeStream.format("memory").queryName("q42c_ooo_out")
        .outputMode(OutputMode.Append).start()
      try {
        // batch 1 arms user 1's timer at 00:06:00; watermark → 00:05:00
        src.addData(Ev(1, ts("2024-01-01 00:05:00"), 1))
        q.processAllAvailable()
        // batch 2 is ONLY a late row (00:00:30 < watermark — the event-time
        // column is projected away before transformWithState, so it is NOT
        // dropped). Re-arming from this batch's max alone would plant the
        // timer at 00:01:30, already behind the watermark → early close.
        src.addData(Ev(2, ts("2024-01-01 00:00:30"), 1))
        q.processAllAvailable()
        assert(spark.table("q42c_ooo_out").count() === 0,
          "late-only batch must not close the session early")
        // watermark passes the REAL expiry → session closes counting both rows
        src.addData(Ev(3, ts("2024-01-01 00:10:00"), 2))
        q.processAllAvailable()
        val rows = spark.table("q42c_ooo_out").as[(Long, Long)].collect().toSet
        assert(rows === Set((1L, 2L)), s"got $rows")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("Q42b: initial state seeds counters from batch history before the first batch") {
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try {
      // batch-computed history: user 1 has 10 prior events, user 9 has 7
      val history = Seq((1L, 10L), (9L, 7L)).toDF("user_id", "n_events")
      val src = MemoryStream[Ev]
      val q = StatefulProcessors.runningCountsSeeded(src.toDF(), history)
        .writeStream.format("memory").queryName("q42b_out")
        .outputMode(OutputMode.Update).start()
      try {
        src.addData(
          Ev(1, ts("2024-01-01 00:00:10"), 1),  // seeded key: 10 + 1
          Ev(2, ts("2024-01-01 00:00:20"), 2))  // unseeded key: 0 + 1
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("q42b_out").as[(Long, Long)].collect().toMap
      assert(out === Map(1L -> 11L, 2L -> 1L), s"got $out")
      // user 9 was seeded but never touched by the stream: no emission —
      // its state waits in the store, it does not replay
      assert(!out.contains(9L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
