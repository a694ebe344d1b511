package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator
import scala.collection.concurrent.TrieMap

/** Shared request budget across every table/slice of ONE pull run — the
  * distributed analogue of the reference's handler-level request counter
  * (`CommCareAPIHandler.py:217-224`, which counts requests across ALL
  * tables of a run and aborts at the limit).
  *
  * Shape: a named [[LongAccumulator]] per run key. The driver acquires the
  * accumulator (cli.runPull), every `graft-rest` partition reader carrying
  * the run's `budget_key` option adds one per HTTP request (executor-side
  * adds flow back through Spark's heartbeat), and the driver — the only
  * place an accumulator is readable — checks the total between table jobs
  * and aborts the run loudly when the cap is spent. In-flight runaways
  * within a single table are still bounded executor-side by the per-reader
  * `max_requests` cap (R11); this budget adds the cross-table guarantee the
  * per-reader cap cannot see.
  */
object RequestBudget {
  private val accs = TrieMap.empty[String, LongAccumulator]

  /** Driver-side: create (or fetch) the run's shared counter. */
  def acquire(spark: SparkSession, key: String): LongAccumulator =
    accs.getOrElseUpdate(key,
      spark.sparkContext.longAccumulator(s"graft.rest.requests.$key"))

  /** Driver-side lookup at scan-build time (createReaderFactory). */
  def lookup(key: String): Option[LongAccumulator] = accs.get(key)

  /** Requests spent so far across the whole run (driver-side read). */
  def spent(key: String): Long =
    accs.get(key).map(_.value.longValue).getOrElse(0L)

  /** Drop the counter when the run ends (success or abort). */
  def release(key: String): Unit = accs.remove(key)
}
