package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

import scala.collection.mutable

/** Whole-operator Catalyst extension — the `injectPlannerStrategy` leg of
  * SparkSessionExtensions (functions and the optimizer rule being the other
  * two): top-k rows PER KEY as a first-class physical operator.
  *
  * The stock way to say "top 3 orders per customer" is a window rank:
  * {{{ row_number() OVER (PARTITION BY key ORDER BY ...) <= k }}}
  * whose physical plan shuffles EVERY row to its key's partition and then
  * FULLY SORTS each partition before discarding all but k — at 100 TB the
  * shuffle carries the whole table and the sort pays n·log n per partition
  * for rows that are thrown away. This operator plans instead as
  *
  *   TopKPerKeyExec(partial) → Exchange(hash by key) → TopKPerKeyExec(final)
  *
  * the aggregate shape: each input partition keeps at most k rows per key
  * in a bounded heap (the map-side combine), so the exchange moves at most
  * k·distinct-keys-per-partition rows — for clustered or low-cardinality
  * data orders of magnitude under the window plan — and no full sort ever
  * happens (heap cost n·log k).
  *
  * Memory contract (the 100 TB question). A hash aggregate falls back to
  * sort-based spilling when its map outgrows memory; this operator's
  * equivalent escape hatch uses the SEMIGROUP property of top-k instead:
  * when the PARTIAL phase's map exceeds
  * `spark.graft.topk.maxBufferedKeys` (default 262144) live keys, it
  * EMITS every buffered row and resets the map — sound because the final
  * phase re-reduces any number of candidate sets per key back to exactly
  * k (topk(topk(A) ∪ topk(B)) = topk(A ∪ B)); worst case (adversarially
  * interleaved keys) degrades throughput toward a plain shuffle of the
  * input, never memory. The FINAL phase cannot flush (two flushes of one
  * key would emit up to 2k rows), but its live map is exactly the
  * operator's OUTPUT for the partition — k rows per key resident in that
  * partition — i.e. the same working set the window-rank plan's sorted
  * partition holds, minus the non-retained rows; a final partition whose
  * OUTPUT outgrows task memory needs more shuffle partitions, the same
  * remedy as any aggregate. `numFlushes` in the node's SQL metrics counts
  * partial-phase resets so the degradation is observable in the UI.
  *
  * Pieces, the full custom-operator stack:
  *  - [[TopKPerKey]]      — logical `UnaryNode`; unresolved attributes are
  *    resolved by the stock analyzer (generic `ResolveReferences` walks any
  *    node's expressions), so the node composes with views/subqueries.
  *  - [[TopKStrategy]]    — `SparkStrategy` planning the two-phase physical
  *    pair; registered via `GraftExtensions.injectPlannerStrategy`.
  *  - [[TopKPerKeyExec]]  — `UnaryExecNode`; `requiredChildDistribution`
  *    (Unspecified for partial, `ClusteredDistribution(keys)` for final)
  *    lets stock `EnsureRequirements` place the single hash exchange.
  *  - [[GraftPlans.topKPerKey]] — the public entry building the logical
  *    node onto an analyzed child frame.
  *
  * Determinism: ties in the ordering keep an arbitrary winner, exactly like
  * `ORDER BY ... LIMIT k` — callers wanting reproducible results include a
  * tiebreaker column, as q50_topk_phys does (reference parity: the window
  * `row_number` form has the identical caveat).
  */
case class TopKPerKey(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerKey: k must be positive, got $k")
  require(grouping.nonEmpty,
    "topKPerKey: empty grouping — global top-k is Spark's own ORDER BY/LIMIT (TakeOrderedAndProject)")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans the logical node as the partial→exchange→final pair. The exchange
  * itself is NOT built here — the final node's `ClusteredDistribution`
  * requirement makes stock `EnsureRequirements` insert (or elide, when the
  * child is already clustered — e.g. downstream of an aggregate on the same
  * keys) the hash exchange, so AQE re-planning and partition coalescing
  * apply to it like to any built-in shuffle. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(grouping, order, k, child) =>
      TopKPerKeyExec(grouping, order, k, partial = false,
        TopKPerKeyExec(grouping, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key over one partition pass. Both phases run the
  * same loop: hash map keyed by the grouping projection, a size-k max-heap
  * per key ordered by the (codegen'd) row comparator, head = worst retained
  * row; a new row replaces the head only if it sorts strictly before it.
  * Emits retained rows unsorted (no ordering contract is declared), copies
  * every buffered row (Spark reuses `UnsafeRow` buffers across `next()`). */
case class TopKPerKeyExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(grouping))
  override def nodeName: String = if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numFlushes" -> SQLMetrics.createMetric(sparkContext, "partial-phase map flushes"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numFlushes = longMetric("numFlushes")
    val (kLocal, groupingLocal, orderLocal, attrs) = (k, grouping, order, child.output)
    // Spill-equivalent escape hatch: cap on LIVE keys in the partial map,
    // read at plan time (executor-side code must not touch SQLConf).
    val maxKeys: Int =
      if (partial)
        conf.getConfString("spark.graft.topk.maxBufferedKeys", "262144").toInt
      else Int.MaxValue // final phase holds its own output; see class doc
    require(maxKeys > 0, s"spark.graft.topk.maxBufferedKeys must be positive, got $maxKeys")
    child.execute().mapPartitions({ iter =>
      // Codegen'd comparator + key projection are built ON the executor —
      // generated classes are not serializable.
      val keyProj = UnsafeProjection.create(groupingLocal, attrs)
      val rowOrd: Ordering[InternalRow] = GenerateOrdering.generate(orderLocal, attrs)
      // Outer iterator of flush batches: consume input until the map is
      // over the key cap (partial phase only) or the input is exhausted,
      // emit the buffered rows, reset, repeat. Each batch is a valid
      // partial top-k; the final phase re-reduces overlapping keys.
      val heaps = new java.util.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      // Inserts `row`; returns false (leaving the row UNCONSUMED in effect —
      // caller must re-offer it after draining) only when the row's key is
      // new AND the map is at the cap. Rows of already-live keys never
      // trigger a flush: they cannot grow the map.
      def offer(row: InternalRow, key: UnsafeRow): Boolean = {
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxKeys) return false
          heap = mutable.PriorityQueue.empty[InternalRow](rowOrd) // max-heap: head sorts LAST
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
        true
      }
      def drainBatch(): Iterator[InternalRow] = {
        import scala.jdk.CollectionConverters._
        // snapshot values then clear: the emitted iterator must not alias
        // the live map the next batch refills
        val rows = heaps.values().asScala.toArray
        heaps.clear()
        rows.iterator.flatMap(_.iterator)
      }
      val batches = new Iterator[Iterator[InternalRow]] {
        private var done = false
        override def hasNext: Boolean = !done
        override def next(): Iterator[InternalRow] = {
          while (iter.hasNext) {
            val row = iter.next()
            if (!offer(row, keyProj(row))) {
              // flush, then the rejected row seeds the next batch's map
              val out = drainBatch()
              numFlushes += 1
              offer(row, keyProj(row))
              return out
            }
          }
          done = true
          drainBatch()
        }
      }
      batches.flatten.map { row => numOutputRows += 1; row }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public builders for the custom-plan operators. */
object GraftPlans {
  /** Top-k rows per key: keep the first `k` rows of each `keys` group in
    * the order given by `orderBy` (`(column, ascending)`). Requires
    * [[graft.functions.GraftExtensions]] on the session (GraftSession and
    * the test session both register it). */
  def topKPerKey(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val grouping = keys.map(UnresolvedAttribute(_))
    val order = orderBy.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute(name), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftshim.GraftSqlShim.ofRows(
      df.sparkSession, TopKPerKey(grouping, order, k, df.queryExecution.analyzed))
  }
}
