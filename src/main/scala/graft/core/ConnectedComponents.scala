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
  * Scale posture: each superstep is two small joins (edge⋈label + min agg,
  * then a label⋈label pointer jump), all-distributed — no driver-side data,
  * the per-step `count()` is a single scalar. The pointer jump (path
  * doubling, the same device as small-star/large-star — Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") gives O(log diameter)
  * rounds where neighbour-min alone needs O(diameter); `localCheckpoint`
  * truncates the growing lineage so step N doesn't replay steps 1..N−1. On
  * a real cluster it would become a reliable-storage `checkpoint`.
  */
object ConnectedComponents {

  /** `vertices`: one column `v`; `edges`: columns `src`,`dst` (one row per
    * undirected edge, either orientation). Returns (`v`, `label`) where
    * `label` = min vertex id in v's component.
    *
    * Propagation runs only over edge ENDPOINTS — on a dedup graph the
    * overwhelming majority of vertices are isolated (label = self) and would
    * otherwise ride through every superstep's shuffle for nothing; they are
    * stitched back with one left join at the end. */
  def labels(vertices: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    // both orientations so a single groupBy(dst) sees every neighbour
    val undirected = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize once (every superstep reuses the cache) and size the
    // supersteps from the measured graph: a dedup pair graph is orders of
    // magnitude smaller than the corpus, and iterating tiny joins at the
    // session's corpus-sized shuffle width pays 30+ empty tasks per stage
    // per round. ~50 k edges per partition, session width as the cap.
    val edgeCount = undirected.count()
    val sess = vertices.sparkSession
    val oldWidth = sess.conf.get("spark.sql.shuffle.partitions")
    val width = math.max(1L, math.min(oldWidth.toLong, edgeCount / 50_000L))
    var labels = undirected.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
    var changed = 1L
    var iters = 0
    // each superstep's localCheckpoint caches an RDD that outlives the loop;
    // free every round's blocks except the final one (still referenced by
    // the returned plan) so a long-lived session doesn't accumulate one
    // orphan RDD per superstep per call. Like the width override above,
    // this assumes no concurrent query is persisting RDDs on this session
    // while the loop runs (single driver thread per operator call).
    val sc = vertices.sparkSession.sparkContext
    val preexisting = sc.getPersistentRDDs.keySet
    var prevRoundIds = Set.empty[Int]
    def ccLoop(): Unit = while (changed > 0 && iters < maxIters) {
      val nbrMin = undirected.join(labels, undirected("src") === labels("v"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_min"))
      // every endpoint has ≥1 neighbour, so inner join keeps the vertex set
      val cand = labels.join(nbrMin, labels("v") === nbrMin("dst"))
        .select(labels("v"),
          least(labels("label"), col("nbr_min")).as("c"),
          labels("label").as("prev"))
      // pointer jump: label(v) ← label(label(v)). Neighbour-min alone needs
      // diameter supersteps (a 13-long chain = 13 rounds, measured); path
      // doubling composes two hops per round → O(log diameter). `c` is
      // always an endpoint id (least of endpoint ids), so the self-join is
      // total.
      // ONE pointer jump per round is the measured optimum: a second jump
      // (four hops/round) only cut rounds 8 → 7 here while deepening every
      // round's checkpoint plan — net 6.4 s → 9.2 s warm. Round count
      // shrinks logarithmically; per-round cost grows linearly.
      val parents = cand.select(col("v").as("pv"), col("c").as("pc"))
      val step = cand.join(parents, cand("c") === col("pv"))
        .select(cand("v"), least(col("c"), col("pc")).as("label"), col("prev"))
        // localCheckpoint EVERY round is load-bearing: the pointer-jump
        // self-join references the label subtree twice, so an untruncated
        // logical plan doubles per round — Catalyst analysis goes
        // exponential (measured: 6.6 s → 50+ s when truncating every 4th
        // round only). The extra materialization job is the cheap side.
        .localCheckpoint(true)
      changed = step.filter(col("label") < col("prev")).count()
      labels = step.select(col("v"), col("label"))
      iters += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] superstep $iters: $changed changed")
      val nowIds = (sc.getPersistentRDDs.keySet -- preexisting).toSet
      prevRoundIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevRoundIds = nowIds
    }
    var succeeded = false
    try {
      sess.conf.set("spark.sql.shuffle.partitions", width.toString)
      ccLoop()
      succeeded = true
    } finally {
      sess.conf.set("spark.sql.shuffle.partitions", oldWidth)
      undirected.unpersist()
      // a mid-superstep failure must not strand checkpoint blocks: free
      // everything this call cached (on success only the final round's RDD
      // stays — the returned plan references it)
      if (!succeeded)
        (sc.getPersistentRDDs.keySet -- preexisting).foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters supersteps")
    // isolated vertices: their own id is their component
    vertices.select(col("v")).join(labels.withColumnRenamed("v", "ev"),
        col("v") === col("ev"), "left")
      .select(col("v"), coalesce(col("label"), col("v")).as("label"))
  }
}
