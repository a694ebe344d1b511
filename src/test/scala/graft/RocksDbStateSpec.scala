package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingJobs

/** The streaming scaladocs repeatedly claim "RocksDB-backed state on a real
  * cluster" — this spec converts the claim into a tested fact: the stateful
  * jobs run unchanged on the RocksDB state store provider (shipped with
  * Spark, rocksdbjni on the classpath), produce the same results as the
  * default in-memory provider, and the progress metrics prove RocksDB was
  * genuinely active rather than a silent fallback. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long)

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("tumbling windows + stateful dedup run on RocksDB state with identical results") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val src = MemoryStream[Ev]
      val q = StreamingJobs.tumblingCounts(src.toDF())
        .writeStream.format("memory").queryName("rocks_tumbling")
        .outputMode(OutputMode.Append).start()
      try {
        src.addData(Ev(1, ts("2024-01-01 00:00:10"), 1),
          Ev(2, ts("2024-01-01 00:00:40"), 2), Ev(3, ts("2024-01-01 00:01:10"), 1))
        q.processAllAvailable()
        src.addData(Ev(9, ts("2024-01-01 00:10:00"), 1)) // settle minutes 0-1
        q.processAllAvailable()
        val rows = spark.table("rocks_tumbling")
          .select($"w_start", $"n").as[(Timestamp, Long)].collect().toMap
        assert(rows(ts("2024-01-01 00:00:00")) === 2L)
        assert(rows(ts("2024-01-01 00:01:00")) === 1L)
        // not a silent fallback: the state operator reports RocksDB-specific
        // custom metrics only the RocksDB provider emits
        val metricKeys = q.recentProgress.flatMap(_.stateOperators)
          .flatMap { so =>
            import scala.jdk.CollectionConverters._
            so.customMetrics.keySet().asScala
          }.toSet
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
          s"no rocksdb metrics in state operators: ${metricKeys.take(10)}")
      } finally q.stop()
    }
  }

  test("dropDuplicatesWithinWatermark collapses re-sends on RocksDB state too") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val src = MemoryStream[Ev]
      val q = StreamingJobs.dedupWithinWatermark(src.toDF())
        .writeStream.format("memory").queryName("rocks_dedup")
        .outputMode(OutputMode.Append).start()
      try {
        src.addData(Ev(7, ts("2024-01-01 00:00:10"), 1))
        q.processAllAvailable()
        src.addData(Ev(7, ts("2024-01-01 00:00:12"), 1)) // boundary re-send
        q.processAllAvailable()
        assert(spark.table("rocks_dedup").count() === 1)
      } finally q.stop()
    }
  }
}
