package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.core.RangeJoin

/** graft.core.RangeJoin — binned point-in-interval join. Pins:
  * (1) pair-set equality with the naive inequality join, including
  * intervals spanning MANY bins and points on every boundary;
  * (2) exactly-once matching (no dedup needed) — the ownership-bin
  * argument, tested by multiplicity not just set equality;
  * (3) bin-width invariance (the tuning knob changes cost, never results);
  * (4) the plan is an EQUI-join (no BroadcastNestedLoopJoin / cartesian —
  * the shape stock Spark gives this predicate);
  * (5) half-open [start, end) boundary semantics. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def collectPhysical(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => collectPhysical(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan).flatMap(collectPhysical)
    case p => p +: p.children.flatMap(collectPhysical)
  }

  // deterministic fixture: points 0..999; intervals of wildly mixed spans
  // (1 unit .. 700 units, i.e. 1..70 bins at width 10), adjacent + nested
  private def points = (0L until 1000L).toDF("pt").withColumn("pid", col("pt"))
  private def intervals = Seq(
    (0L, 1L, "tiny"), (0L, 700L, "huge"), (5L, 15L, "crossing"),
    (10L, 20L, "aligned"), (250L, 260L, "nested"), (999L, 1000L, "last"),
    (990L, 1005L, "overhang"), (300L, 300L, "empty"), (400L, 390L, "reversed")
  ).toDF("s", "e", "label") // empty + reversed must match nothing (operator guard)

  private def naivePairs = points.as("p").join(intervals.as("i"),
    col("pt") >= col("s") && col("pt") < col("e"))
    .select(col("pt"), col("s"), col("e")).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("pair multiset equals the naive inequality join (multi-bin spans, boundaries)") {
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 10L)
      .select(col("pt"), col("s"), col("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = naivePairs
    assert(got.sorted.toSeq == want.sorted.toSeq,
      s"got ${got.length} pairs, want ${want.length}")
    // exactly-once: no pair may appear twice even when an interval spans 70 bins
    assert(got.distinct.length == got.length, "duplicate (point, interval) pair")
    // boundary: start inclusive, end exclusive
    assert(got.contains((0L, 0L, 1L)) && !got.exists(p => p._1 == 1L && p._2 == 0L && p._3 == 1L))
    assert(got.contains((999L, 999L, 1000L)))
  }

  test("bin width changes cost only, never the result") {
    val w10 = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 10L)
      .select(col("pt"), col("s")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (w <- Seq(1L, 7L, 1000L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", w)
        .select(col("pt"), col("s")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == w10, s"binWidth=$w diverged")
    }
  }

  test("plan is an equi-join on the bin — never BroadcastNestedLoop/cartesian") {
    val df = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 10L)
    df.collect()
    val names = collectPhysical(df.queryExecution.executedPlan).map(_.nodeName)
    assert(!names.exists(n => n.contains("BroadcastNestedLoop") || n.contains("Cartesian")),
      s"quadratic join shape: $names")
    assert(names.exists(n => n.contains("SortMergeJoin") || n.contains("ShuffledHashJoin")
      || n.contains("BroadcastHashJoin")), s"no hash/merge equi-join in: $names")
  }

  test("negative coordinates floor correctly (floor, not truncate-toward-zero)") {
    val p = Seq(-15L, -10L, -5L, -1L, 0L, 5L).toDF("pt")
    val i = Seq((-12L, -3L)).toDF("s", "e")
    val got = RangeJoin.pointInInterval(p, "pt", i, "s", "e", 10L)
      .select(col("pt")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(-10L, -5L), s"got $got")
  }

  // ---- intervalOverlap: the ownership-bin exactly-once form ----

  // spans from 1 unit to 500 units: nested, containing, touching, disjoint
  private def leftIv = Seq(
    (0L, 500L, 1L), (10L, 20L, 2L), (19L, 21L, 3L), (100L, 101L, 4L),
    (200L, 300L, 5L), (300L, 310L, 6L), (700L, 700L, 7L)
  ).toDF("ls", "le", "lid")
  private def rightIv = Seq(
    (15L, 25L, 11L), (20L, 30L, 12L), (0L, 1000L, 13L), (99L, 100L, 14L),
    (299L, 301L, 15L), (650L, 800L, 16L)
  ).toDF("rs", "re", "rid")

  // the raw predicate assumes non-empty intervals — an empty [s, s) would
  // satisfy it against any container, so the naive reference filters them
  // exactly as the operator's guard does (an empty set overlaps nothing)
  private def naiveOverlap = leftIv.filter(col("ls") < col("le"))
    .join(rightIv.filter(col("rs") < col("re")),
      col("ls") < col("re") && col("rs") < col("le"))
    .select(col("lid"), col("rid")).collect()
    .map(r => (r.getLong(0), r.getLong(1)))

  test("overlap pair multiset equals the naive join; exactly once despite shared bins") {
    val got = RangeJoin.intervalOverlap(leftIv, "ls", "le", rightIv, "rs", "re", 10L)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == naiveOverlap.sorted.toSeq,
      s"got ${got.sorted.toSeq}\nwant ${naiveOverlap.sorted.toSeq}")
    // (1,13) share 50 bins at w=10 — must appear exactly once
    assert(got.distinct.length == got.length, "duplicate overlap pair")
    // touching-not-overlapping: [10,20) vs [20,30) must NOT match
    assert(!got.contains((2L, 12L)))
    // empty interval [700,700) matches nothing even inside [650,800)
    assert(!got.exists(_._1 == 7L))
  }

  test("overlap bin width invariance") {
    val w10 = RangeJoin.intervalOverlap(leftIv, "ls", "le", rightIv, "rs", "re", 10L)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (w <- Seq(1L, 3L, 64L, 100000L)) {
      val got = RangeJoin.intervalOverlap(leftIv, "ls", "le", rightIv, "rs", "re", w)
        .select(col("lid"), col("rid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == w10, s"binWidth=$w diverged")
    }
  }

  test("overlap plan is an equi-join, never BNLJ/cartesian") {
    val df = RangeJoin.intervalOverlap(leftIv, "ls", "le", rightIv, "rs", "re", 10L)
    df.collect()
    val names = collectPhysical(df.queryExecution.executedPlan).map(_.nodeName)
    assert(!names.exists(n => n.contains("BroadcastNestedLoop") || n.contains("Cartesian")),
      s"quadratic join shape: $names")
  }

  test("disjoint-name and positive-width guards") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "pt", intervals.withColumnRenamed("s", "pt"), "pt", "e", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 0L)
    }
  }
}
