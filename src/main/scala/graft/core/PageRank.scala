package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank in FIXED-POINT integer arithmetic.
  *
  * Why integers: float PageRank is summation-order-dependent — the same
  * graph yields last-ulp-different ranks under different partitionings, so
  * the result can neither be hash-compared across engines nor reproduced
  * across cluster topologies. Here ranks are int64 fixed-point units and
  * every step is BIGINT `DIV`/`*`/`+` (commutative, associative, exact), so
  * the ranks are bit-identical at any parallelism and a DuckDB oracle can
  * replay them — the same determinism contract the q33 hash-sampling lanes
  * hold. The per-step floor rounding makes this a (deliberately) defined
  * variant: mass leaks ≤ 1 unit per edge per iteration, which at r0 = 10¹²
  * units is a ~10⁻¹² relative effect — far below any ranking use.
  *
  * Semantics per iteration, for each node v:
  *   rank'(v) = teleport + (dampNum · Σ_{(u,v,w)} w · (rank(u) DIV outW(u))) DIV dampDen
  * with teleport = ((dampDen − dampNum) · r0) DIV dampDen and
  * outW(u) = Σ out-edge weights of u. Nodes with no out-edges (dangling)
  * simply leak their mass — callers with dangling nodes should add
  * self-loops or back-edges (the q55 purchase graph is bidirectional, so
  * every node has out-degree ≥ 1).
  *
  * Overflow budget: the damped sum needs dampNum · N · r0 < 2⁶³, so pick
  * r0 ≤ 2⁶³ / (dampDen · N). At N = 10⁹ nodes that still leaves
  * r0 ≈ 9·10⁷ — 26 bits of rank resolution, ample for ordering.
  *
  * Scale shape (the Pregel loop expressed in DataFrames): edges+outW are
  * computed once and persisted; each superstep is ONE shuffle-join of the
  * (small) rank frame onto the edge partitioning plus ONE map-side-combining
  * aggregation on dst. The rank frame is localCheckpoint-ed every
  * iteration — it is N rows (tiny relative to edges), and the checkpoint
  * truncates the lineage so the plan stays constant-size across iterations
  * instead of nesting `iters` joins (the ConnectedComponents superstep
  * discipline, core/ConnectedComponents.scala). On a real cluster the edge
  * frame would be pre-partitioned by src so each superstep reuses the edge
  * exchange and only ships ranks.
  */
object PageRank {

  /** edges: (src: string, dst: string, w: long). Returns (node, rank). */
  def run(edges: DataFrame, iters: Int, r0: Long,
          dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 0 && r0 > 0 && dampNum > 0 && dampDen > dampNum)
    val teleport = ((dampDen - dampNum) * r0) / dampDen
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val eo = e.join(outw, "src").persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    try {
      var ranks = nodes.select(col("node"), lit(r0).as("rank")).localCheckpoint()
      for (_ <- 1 to iters) {
        val contrib = eo.join(ranks, eo("src") === ranks("node"))
          .select(eo("dst").as("cdst"), (col("w") * expr("rank DIV outw")).as("c"))
          .groupBy(col("cdst")).agg(sum(col("c")).as("contrib"))
        ranks = nodes.join(contrib, nodes("node") === contrib("cdst"), "left")
          .select(col("node"),
            (lit(teleport) +
              expr(s"($dampNum * coalesce(contrib, CAST(0 AS BIGINT))) DIV $dampDen"))
              .as("rank"))
          .localCheckpoint()
      }
      ranks
    } finally {
      eo.unpersist()
      nodes.unpersist()
    }
  }
}
