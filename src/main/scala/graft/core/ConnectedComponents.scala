package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation:
  * every vertex starts labelled with its own id; each superstep lowers a
  * vertex's label to the minimum label among itself and its neighbours;
  * convergence (no label changed) labels every vertex with its component's
  * minimum id. This is the exact-clustering twin of the greedy keep-first
  * dedup policy (Similarity.q26DedupSurvivors): greedy keeps any vertex with
  * no smaller neighbour, CC keeps only each component's global minimum — the
  * two differ on hub-and-spoke shapes (1–3, 2–3: greedy keeps {1,2}, CC
  * keeps {1}).
  *
  * Scale posture: each superstep is one shuffle (edge⋈label join + min agg),
  * all-distributed — no driver-side data, the per-step `count()` is a single
  * scalar. Rounds = graph diameter, which for near-dup clusters (cliques and
  * short chains) is 1–3; `localCheckpoint` truncates the growing lineage so
  * step N doesn't replay steps 1..N−1. On a real cluster with adversarial
  * diameters, swap the propagation step for alternating small-star /
  * large-star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"), which converges in O(log n) rounds over the same join shape;
  * `localCheckpoint` would become a reliable-storage `checkpoint`.
  */
object ConnectedComponents {

  /** `vertices`: one column `v`; `edges`: columns `src`,`dst` (one row per
    * undirected edge, either orientation). Returns (`v`, `label`) where
    * `label` = min vertex id in v's component. */
  def labels(vertices: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    // both orientations so a single groupBy(dst) sees every neighbour
    val undirected = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    undirected.count() // materialize once; every superstep reuses the cache
    var labels = vertices.select(col("v"), col("v").as("label"))
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      val nbrMin = undirected.join(labels, undirected("src") === labels("v"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_min"))
      val step = labels.join(nbrMin, labels("v") === nbrMin("dst"), "left")
        .select(labels("v"),
          least(labels("label"), coalesce(col("nbr_min"), labels("label"))).as("label"),
          labels("label").as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = step.filter(col("label") < col("prev")).count()
      // truncate lineage: without this, superstep N's plan replays 1..N−1
      labels = step.select(col("v"), col("label")).localCheckpoint(true)
      step.unpersist()
      iters += 1
    }
    undirected.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters supersteps")
    labels
  }
}
