package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState,
  OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig,
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

  /** Output row of the per-type breakdown: one (user, type) running count. */
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user per-event-type running counts over MapState — the keyed
    * sub-structure state type (ValueState holds one value per key;
    * MapState holds a keyed map per key, stored as individual state rows
    * so updating one sub-key never rewrites the others — the property
    * that matters when a user's map has thousands of entries). Emits the
    * touched (user, type) pairs per batch, update-mode style. */
  class TypeBreakdownProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, String), TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("by_type",
        Encoders.STRING, Encoders.scalaLong, ttl)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashMap[String, Long]()
      rows.foreach { case (_, t) =>
        val cur = touched.getOrElse(t,
          if (counts.containsKey(t)) counts.getValue(t) else 0L)
        touched(t) = cur + 1
      }
      touched.foreach { case (t, n) => counts.updateValue(t, n) }
      touched.iterator.map { case (t, n) => TypeCount(key, t, n) }.toSeq.iterator
    }
  }

  /** Q42d: per-user per-type running event counts via MapState. */
  def typeBreakdown(events: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[TypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TypeBreakdownProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** Output row of the trail keeper: a user's recent event ids, oldest
    * first, serialized for assertion/inspection. */
  case class Trail(user_id: Long, recent: String)

  /** Last-K event ids per user over ListState — the append-log state type
    * (appendValue is O(1) per arrival; the trim rewrites only when the cap
    * is crossed). The "recent activity" shape: fraud trails, dedup-recent
    * windows, UI activity feeds. K bounds state per key regardless of
    * lifetime event count. */
  class RecentTrailProcessor(k: Int)
      extends StatefulProcessor[Long, (Long, Long), Trail] {
    @transient private var trail: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      trail = getHandle.getListState[Long]("trail", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[Trail] = {
      rows.foreach { case (_, id) => trail.appendValue(id) }
      val all = trail.get().toSeq
      val recent = all.takeRight(k)
      if (all.length > k) trail.put(recent.toArray) // trim to the cap
      Iterator.single(Trail(key, recent.mkString(",")))
    }
  }

  /** Q42e: per-user last-K event-id trails via ListState. */
  def recentTrails(events: DataFrame, k: Int): Dataset[Trail] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RecentTrailProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Output row of the inactivity sessionizer: a closed session. */
  case class ClosedSession(user_id: Long, n_events: Long)

  /** Per-user inactivity sessionizer on EVENT-TIME timers — the timer half
    * of the transformWithState API (session_window covers the aggregation
    * form; this is the explicit-state form that can carry arbitrary
    * per-session payloads). Each event refreshes the key's count and
    * re-registers a timer at event-time + gap; when the WATERMARK passes
    * the timer (deterministic — no wall clock involved), the session emits
    * once as closed and its state clears. State per key is one counter and
    * one timer regardless of session length, and quiet keys leave the
    * store entirely — the bounded-state property that matters when the key
    * space is 100 TB of users. */
  class InactivitySessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, Long), ClosedSession] {
    @transient private var countState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      var n = if (countState.exists()) countState.get() else 0L
      var maxTs = Long.MinValue
      rows.foreach { case (_, t) => n += 1; if (t > maxTs) maxTs = t }
      countState.update(n)
      // One live timer per key, re-armed at latest-activity + gap. The
      // watermarked event-time column is projected away before
      // transformWithState, so a batch can consist entirely of out-of-order
      // rows; never move an armed timer BACKWARD (that would close the
      // session early with an undercount) — take the max with the existing
      // expiry before re-arming.
      val existing = getHandle.listTimers().toSeq
      val armAt = (existing :+ (maxTs + gapMs)).max
      existing.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(armAt)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val n = if (countState.exists()) countState.get() else 0L
      countState.clear()
      Iterator.single(ClosedSession(key, n))
    }
  }

  /** Q42c: explicit-state inactivity sessions (user_id, ts) → closed
    * sessions, emitted when the event-time watermark passes last activity
    * + gap. Input needs a watermark on `ts` for EventTime time mode. */
  def inactivitySessions(events: DataFrame, gapMs: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").cast("long"),
        (col("ts").cast("double") * 1000).cast("long").as("ts_ms"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new InactivitySessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
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
