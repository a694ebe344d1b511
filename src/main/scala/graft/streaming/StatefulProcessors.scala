package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** `transformWithState` surface — Spark 4's arbitrary-stateful operator
  * (the successor to `flatMapGroupsWithState`): typed per-key state
  * handles (Value/List/Map), per-state TTL, and timers, running only on
  * the RocksDB state-store provider (the cluster-grade provider
  * RocksDbStateSpec already exercises for the window/dedup jobs).
  *
  * The processor here is the accumulating shape the reference's restart
  * semantics need (`CommCareAPIHandler.py:217-258` keeps per-extraction
  * progress across polls): a per-user lifetime event counter whose state
  * carries a TTL — the knob that bounds state size for keys that go
  * quiet, which at 100 TB of events is what keeps the store from growing
  * with every user ever seen rather than with ACTIVE users.
  */
object StatefulProcessors {

  /** Output row: the user's running total after each micro-batch. */
  case class UserCount(user_id: Long, n_events: Long)

  /** Per-user running event counter over ValueState[Long].
    * Emits one row per key per micro-batch (update mode) — the
    * incremental-aggregation shape, with explicit state instead of a
    * windowed agg, so the count survives across batches indefinitely
    * (bounded only by the TTL). */
  class RunningCountProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Long, UserCount] {
    @transient private var countState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long]("n", Encoders.scalaLong, ttl)

    override def handleInputRows(key: Long, rows: Iterator[Long],
        timerValues: TimerValues): Iterator[UserCount] = {
      val n = (if (countState.exists()) countState.get() else 0L) + rows.size
      countState.update(n)
      Iterator.single(UserCount(key, n))
    }
  }

  /** Q42: per-user running event counts via transformWithState.
    * Update-mode output; state TTL defaults to NONE (lifetime counts) —
    * pass a TTL to bound the store by key activity instead. */
  def runningCounts(events: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .transformWithState(new RunningCountProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
