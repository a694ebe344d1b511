package org.apache.spark.graftshim

import org.apache.spark.TaskContext
import org.apache.spark.memory.{MemoryConsumer, MemoryMode, TaskMemoryManager}

/** `TaskContext.taskMemoryManager()` is `private[spark]`, so the one-line
  * accessor a memory-cooperating physical operator needs lives here, inside
  * the `org.apache.spark` namespace — the same doorway technique as
  * [[org.apache.spark.sql.graftshim.GraftSqlShim]] (and every public Spark
  * extension library's `org.apache.spark.*` shim package). Nothing else
  * crosses the line: [[MemoryConsumer]] itself is a public extension point
  * (protected constructor, designed for subclassing).
  */
object TaskMemoryShim {

  /** The running task's memory manager, or null outside a task. */
  def currentTaskMemoryManager(): TaskMemoryManager = {
    val tc = TaskContext.get()
    if (tc == null) null else tc.taskMemoryManager()
  }

  /** A bookkeeping-only consumer: it acquires execution-memory quota on
    * behalf of an operator whose buffer lives in plain JVM objects (so
    * there are no Tungsten pages to hand back under pressure — `spill`
    * reports 0, exactly like Spark's own non-spillable consumers). The
    * OWNING operator reacts to a failed/partial `acquireMemory` by
    * flushing its buffer and freeing the quota; other consumers' requests
    * meanwhile see the quota as taken and spill THEIR pages — two-way
    * cooperation with unified memory management.
    */
  final class QuotaConsumer(tmm: TaskMemoryManager)
      extends MemoryConsumer(tmm, tmm.pageSizeBytes(), MemoryMode.ON_HEAP) {
    override def spill(size: Long, trigger: MemoryConsumer): Long = 0L
  }

  /** Null-safe builder: no task ⇒ no consumer (caller falls back to its
    * hard caps — the path unit tests driving `doExecute` directly take). */
  def quotaConsumer(): QuotaConsumer = {
    val tmm = currentTaskMemoryManager()
    if (tmm == null) null else new QuotaConsumer(tmm)
  }
}
