package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** [[RunningCountProcessor]] that BOOTSTRAPS each key's counter from a
    * batch-computed value before the first micro-batch touches it — the
    * cutover shape: a streaming pipeline replacing a batch one must not
    * restart every accumulator at zero, and replaying 100 TB of history
    * through the stream just to rebuild state is not a plan. Initial
    * state arrives co-partitioned with the stream (one shuffle at query
    * start), so seeding scales with the history table, not the stream. */
  class SeededCountProcessor(ttl: TTLConfig)
      extends StatefulProcessorWithInitialState[Long, Long, UserCount, UserCount] {
    @transient private var countState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long]("n", Encoders.scalaLong, ttl)

    override def handleInitialState(key: Long, initial: UserCount,
        timerValues: TimerValues): Unit =
      countState.update(initial.n_events)

    override def handleInputRows(key: Long, rows: Iterator[Long],
        timerValues: TimerValues): Iterator[UserCount] = {
      val n = (if (countState.exists()) countState.get() else 0L) + rows.size
      countState.update(n)
      Iterator.single(UserCount(key, n))
    }
  }

  /** Q42b: running counts seeded from a batch history table
    * (`user_id`, `n_events`). Keys present only in the history emit
    * nothing until the stream touches them — their state waits, seeded. */
  def runningCountsSeeded(events: DataFrame, history: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    val init = history
      .select(col("user_id").cast("long"), col("n_events").cast("long"))
      .as[UserCount].groupByKey(_.user_id)
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .transformWithState(new SeededCountProcessor(ttl),
        TimeMode.None(), OutputMode.Update(), init)
  }
}
