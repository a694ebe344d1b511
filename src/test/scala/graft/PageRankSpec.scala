package graft

import org.apache.spark.sql.functions._

/** Fixed-point PageRank (core/PageRank.scala): exact equality against a
  * driver-side replica of the integer recurrence, structural rank ordering,
  * and bit-determinism under repartitioning — the property that justifies
  * the fixed-point design over float PageRank.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the documented recurrence, for exact compare. */
  private def replica(edges: Seq[(String, String, Long)], iters: Int, r0: Long,
                      dampNum: Long = 85L, dampDen: Long = 100L): Map[String, Long] = {
    val teleport = ((dampDen - dampNum) * r0) / dampDen
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var ranks = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, d, w) => d -> w * (ranks(s) / outw(s)) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      ranks = nodes.map(n => n -> (teleport + (dampNum * contrib.getOrElse(n, 0L)) / dampDen)).toMap
    }
    ranks
  }

  private val star = Seq(
    ("a", "b", 1L), ("b", "a", 1L),
    ("a", "c", 1L), ("c", "a", 1L),
    ("a", "d", 1L), ("d", "a", 1L))

  test("star graph: exact match with the driver-side integer replica") {
    val got = graft.core.PageRank.run(star.toDF("src", "dst", "w"), iters = 5, r0 = 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === replica(star, 5, 1000000L))
    // hub out-ranks the symmetric leaves, which tie exactly
    assert(got("a") > got("b"))
    assert(got("b") === got("c") && got("c") === got("d"))
  }

  test("edge weight shifts rank: heavier in-edge wins") {
    val g = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
    val got = graft.core.PageRank.run(g.toDF("src", "dst", "w"), iters = 8, r0 = 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === replica(g, 8, 1000000L))
    assert(got("b") > got("c"))
  }

  test("non-positive weights are dropped BEFORE the gate: both strategies agree") {
    // w<=0 edges used to diverge across the gate (singleTask guarded
    // outw>0; the superstep division did not — NULL-drop or ANSI
    // DIVIDE_BY_ZERO above the gate). They are now filtered in run()
    // so the same input yields identical ranks under either strategy,
    // equal to the replica over the positive-weight edge subset.
    val g = Seq(("a", "b", 1L), ("b", "a", 1L),
      ("z", "a", 0L), ("a", "z", -3L), ("b", "z", 0L))
    val kept = g.filter(_._3 > 0)
    val fused = graft.core.PageRank.run(g.toDF("src", "dst", "w"), 5, 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dist = graft.core.PageRank.run(g.toDF("src", "dst", "w"), 5, 1000000L,
        gateEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fused === dist, "strategies diverged on w<=0 edges")
    assert(fused === replica(kept, 5, 1000000L))
    assert(!fused.contains("z"), "a node reachable only via dropped edges has no rank row")
  }

  test("gate boundary: distributed supersteps ≡ fused single task") {
    // force the >gate path on the hand graphs (gateEdges = 0) and compare
    // with the default single-task path — same integer recurrence, so the
    // two strategies must agree bit-for-bit (the CC gate-boundary shape)
    for (g <- Seq(star, Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L)))) {
      val fused = graft.core.PageRank.run(g.toDF("src", "dst", "w"), 6, 1000000L)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      val dist = graft.core.PageRank.run(g.toDF("src", "dst", "w"), 6, 1000000L,
          gateEdges = 0L)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(fused === dist)
    }
  }

  test("bit-determinism: any partitioning yields identical ranks") {
    val base = graft.core.PageRank.run(star.toDF("src", "dst", "w"), 5, 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val repart = graft.core.PageRank.run(star.toDF("src", "dst", "w").repartition(7), 5, 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(base === repart)
  }

  test("mass only leaks down: total rank stays within (floor-loss, N·r0]") {
    val ranks = graft.core.PageRank.run(star.toDF("src", "dst", "w"), 10, 1000000L)
    val total = ranks.agg(sum($"rank")).head.getLong(0)
    assert(total <= 4L * 1000000L)
    assert(total > 4L * 1000000L * 9 / 10) // floor loss is ~1 unit/edge/iter
  }

  test("edge/node caches are released; only rank checkpoints may linger") {
    // eo/nodes unpersist in finally; the localCheckpoint RDDs (init + one
    // per iteration, tiny N-row frames) are released by the ContextCleaner
    // once the caller drops the frame — bounded, not accumulating per edge
    val before = spark.sparkContext.getPersistentRDDs.size
    graft.core.PageRank.run(star.toDF("src", "dst", "w"), 2, 1000L).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 3)
  }
}
