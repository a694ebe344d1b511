package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{GraftPlans, TopKPerKeyExec}

/** The injectPlannerStrategy leg end-to-end: graft.plans.TopKPerKey
  * (logical node → TopKStrategy → partial/final TopKPerKeyExec pair).
  * Pins: (1) row-set equality with the window-rank twin; (2) the physical
  * shape — both phases present, exactly ONE shuffle, NO Sort/Window node;
  * (3) the scale claim — the partial phase's output metric is bounded by
  * k·keys·partitions and far under the input row count; (4) k ≥ group size
  * keeps whole groups; (5) EnsureRequirements ELIDES the exchange when the
  * child is already hash-partitioned on the keys (the co-location path a
  * 100 TB plan rides when top-k follows an aggregate on the same keys). */
class TopKStrategySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def orders = graft.core.Tables.orders(spark, dir)
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  // Unwraps the AQE containers (AdaptiveSparkPlanExec, the QueryStageExec
  // leaves that hide materialized subtrees) so assertions see real operators.
  private def collectPhysical(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => collectPhysical(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan).flatMap(collectPhysical)
    case p => p +: p.children.flatMap(collectPhysical)
  }

  test("row set equals the window-rank twin; plan is heap pair + one shuffle, no sort") {
    val custom = GraftPlans.topKPerKey(
      orders, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val twin = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")

    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val got = custom.collect().map(key).toSet
    val want = twin.collect().map(key).toSet
    assert(got == want, s"diff: missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty)

    custom.collect() // ensure final plan + metrics are populated
    val nodes = collectPhysical(custom.queryExecution.executedPlan)
    val topks = nodes.collect { case t: TopKPerKeyExec => t }
    assert(topks.map(_.partial).sorted == Seq(false, true),
      s"expected one partial + one final, got ${topks.map(_.nodeName)}")
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      "exactly one exchange between the phases")
    val names = nodes.map(_.nodeName)
    assert(!names.exists(n => n.contains("Sort") || n.contains("Window")),
      s"no sort/window may appear: $names")
  }

  test("partial phase bounds the exchange: ≤ k rows per key per input partition") {
    val df = GraftPlans.topKPerKey(
      orders, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    df.collect()
    val nodes = collectPhysical(df.queryExecution.executedPlan)
    val partial = nodes.collect { case t: TopKPerKeyExec if t.partial => t }.head
    val shuffled = partial.metrics("numOutputRows").value
    val nInput = orders.count()
    val nKeys = orders.select("o_custkey").distinct().count()
    val nParts = orders.rdd.getNumPartitions
    assert(shuffled <= 3L * nKeys * nParts, s"$shuffled rows left the partial phase")
    assert(shuffled < nInput,
      s"partial must shrink the exchange: $shuffled !< $nInput input rows")
  }

  test("k >= group size keeps whole groups (and never duplicates)") {
    val df = GraftPlans.topKPerKey(
      orders, Seq("o_custkey"), Seq(("o_totalprice", false)), 1000000)
    assert(df.count() == orders.count())
  }

  test("exchange elided when the child is already clustered on the keys") {
    val pre = orders.repartition(4, col("o_custkey"))
    val df = GraftPlans.topKPerKey(
      pre, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    df.collect()
    val nodes = collectPhysical(df.queryExecution.executedPlan)
    // the only exchange is the explicit repartition — none between the phases
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      s"expected the repartition exchange only: ${nodes.map(_.nodeName)}")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("null keys and null ordering values follow the window twin exactly") {
    import spark.implicits._
    // null key -> its own group (UnsafeRow null-aware equality); null order
    // values follow SortOrder's default null ordering, same as the window
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (1L, 1L, 10.0), (1L, 2L, null), (1L, 3L, 30.0), (1L, 4L, 20.0),
      (null, 5L, 50.0), (null, 6L, null), (null, 7L, 70.0),
      (2L, 8L, null), (2L, 9L, null)
    ).toDF("k", "id", "v")
    val custom = GraftPlans.topKPerKey(rows, Seq("k"), Seq(("v", false), ("id", true)), 2)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    val twin = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(custom == twin, s"custom $custom vs window $twin")
    assert(custom.intersect(Set(5L, 7L)) == Set(5L, 7L), "null key group must survive")
  }

  test("partial-phase key-cap flush keeps results exact (semigroup fallback)") {
    // Cap the partial map at 4 live keys over ~1500 orders / hundreds of
    // customers: the map flushes dozens of times per partition, the final
    // phase re-reduces the overlapping candidate sets — results must stay
    // row-identical to the unbounded run AND the window twin. This is the
    // operator's spill-equivalent escape hatch: memory stays O(cap·k)
    // regardless of key cardinality (the round-9 review's OOM scenario).
    val run = () => GraftPlans.topKPerKey(
      orders, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val unbounded = run().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.topk.maxBufferedKeys", "4")
    try {
      val capped = run()
      val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == unbounded,
        s"diff: missing=${unbounded -- got} extra=${got -- unbounded}")
      val nodes = collectPhysical(capped.queryExecution.executedPlan)
      val partial = nodes.collect { case t: TopKPerKeyExec if t.partial => t }.head
      assert(partial.metrics("numFlushes").value > 0,
        "cap=4 over hundreds of keys must have flushed at least once")
      // degradation bound: flushing can at most forward every input row
      assert(partial.metrics("numOutputRows").value <= orders.count())
    } finally spark.conf.unset("spark.graft.topk.maxBufferedKeys")
  }

  test("partial-phase BYTE-cap flush keeps results exact (memory-pressure path)") {
    // The r10 memory-aware path: the flush the TaskMemoryManager reservation
    // triggers under real pressure is exercised deterministically here via
    // the hard byte cap — 16 KiB over ~1500 orders forces many flushes per
    // partition through the same reserve()-refusal branch acquireMemory
    // exhaustion takes; results must stay row-identical.
    val run = () => GraftPlans.topKPerKey(
      orders, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val unbounded = run().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.topk.maxBufferBytes", "16384")
    try {
      val capped = run()
      val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == unbounded,
        s"diff: missing=${unbounded -- got} extra=${got -- unbounded}")
      val nodes = collectPhysical(capped.queryExecution.executedPlan)
      val partial = nodes.collect { case t: TopKPerKeyExec if t.partial => t }.head
      assert(partial.metrics("numFlushes").value > 0,
        "16 KiB cap over ~1500 rows must have flushed at least once")
      assert(partial.metrics("numOutputRows").value <= orders.count())
    } finally spark.conf.unset("spark.graft.topk.maxBufferBytes")
  }

  test("FINAL-phase pressure switches to the external-sort fallback; results stay exact") {
    // r10 verdict task 3: pre-r11 the final phase reserved best-effort and
    // had no pressure path — a high-cardinality final partition could only
    // OOM. Forcing pressure deterministically via the finalMaxBytes hook
    // (the same reserve()-refusal branch a real acquireMemory exhaustion
    // takes) must now hand the partition to the spill-capable external
    // sorter and still produce the exact row set, with the switch counted
    // in the node's metrics — graceful degradation, not an executor OOM.
    val run = () => GraftPlans.topKPerKey(
      orders, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val unbounded = run().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.topk.finalMaxBytes", "16384")
    try {
      val pressured = run()
      val got = pressured.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == unbounded,
        s"diff: missing=${unbounded -- got} extra=${got -- unbounded}")
      val nodes = collectPhysical(pressured.queryExecution.executedPlan)
      val fin = nodes.collect { case t: TopKPerKeyExec if !t.partial => t }.head
      assert(fin.metrics("numSortFallbacks").value > 0,
        "16 KiB final cap over ~1500 rows must have switched to the sort fallback")
    } finally spark.conf.unset("spark.graft.topk.finalMaxBytes")
  }

  test("final-phase sort fallback handles null keys / null order values exactly") {
    import spark.implicits._
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (1L, 1L, 10.0), (1L, 2L, null), (1L, 3L, 30.0), (1L, 4L, 20.0),
      (null, 5L, 50.0), (null, 6L, null), (null, 7L, 70.0),
      (2L, 8L, null), (2L, 9L, null)
    ).toDF("k", "id", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    val twin = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    spark.conf.set("spark.graft.topk.finalMaxBytes", "1") // every final partition falls back
    try {
      val custom = GraftPlans.topKPerKey(rows, Seq("k"), Seq(("v", false), ("id", true)), 2)
        .select(col("id")) // metrics must be read off the EXECUTED frame's plan
      val got = custom.collect().map(_.getLong(0)).toSet
      assert(got == twin, s"custom $got vs window $twin")
      val nodes = collectPhysical(custom.queryExecution.executedPlan)
      val fin = nodes.collect { case t: TopKPerKeyExec if !t.partial => t }.head
      assert(fin.metrics("numSortFallbacks").value > 0)
    } finally spark.conf.unset("spark.graft.topk.finalMaxBytes")
  }

  test("composes downstream: aggregate over the custom node") {
    val df = GraftPlans.topKPerKey(
        orders, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    assert(df.filter(col("n") > 3).count() == 0)
    assert(df.count() == orders.select("o_custkey").distinct().count())
  }
}
