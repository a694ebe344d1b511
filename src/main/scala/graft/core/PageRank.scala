package graft.core

import org.apache.spark.sql.{DataFrame, Encoders}
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
  * Two execution strategies behind one semantic, size-gated like
  * `ConnectedComponents` (single-task union-find ≤ 4 M edges, distributed
  * supersteps above): iterating 10 supersteps as Spark jobs costs ~10×
  * (scheduling + shuffle + checkpoint) regardless of data size, which
  * swamps small graphs — measured 8–13 s at 1.2 M edges where the fused
  * single task does the same arithmetic in well under a second.
  *
  *  - **≤ gateEdges** (default 4 M, ~100 MB of edge tuples): one
  *    `mapPartitions` task runs ALL iterations over primitive arrays —
  *    the identical recurrence, bit-identical output (integer arithmetic
  *    has no order dependence to hide).
  *  - **above the gate** (the 100 TB path): the Pregel loop in
  *    DataFrames — edges+outW persisted once, each superstep is ONE
  *    shuffle-join of the (small) rank frame onto the edge partitioning
  *    plus ONE map-side-combining aggregation on dst, rank lineage
  *    truncated per superstep with LAZY localCheckpoints (eager ones add
  *    a materialization job per iteration — measured 13.6 s vs 8.2 s at
  *    1.2 M edges) and one eager checkpoint at the end so every cache can
  *    be released before return. Rehearsed at 37.5 M edges / 512 k nodes
  *    (ScaleSmoke 32×).
  */
object PageRank {

  /** edges: (src: string, dst: string, w: long). Returns (node, rank). */
  def run(edges: DataFrame, iters: Int, r0: Long,
          dampNum: Long = 85L, dampDen: Long = 100L,
          gateEdges: Long = 4000000L): DataFrame = {
    require(iters >= 0 && r0 > 0 && dampNum > 0 && dampDen > dampNum)
    // Non-positive weights are dropped BEFORE the strategy gate so both
    // paths see the identical edge set: singleTask guards contributions
    // with outw > 0 while the superstep path divides `rank DIV outw`
    // unguarded — without this filter a w<=0 edge could make the same
    // input succeed under the gate and NULL-drop (non-ANSI) or raise
    // DIVIDE_BY_ZERO (ANSI) above it, breaking the one-semantic/two-
    // strategies contract. After the filter every src with edges has
    // outw >= 1, so the superstep division is total.
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .filter(col("w") > 0)
      .persist()
    try {
      if (e.count() <= gateEdges) singleTask(e, iters, r0, dampNum, dampDen)
      else supersteps(e, iters, r0, dampNum, dampDen)
    } finally e.unpersist()
  }

  /** All iterations fused into one task over primitive arrays. The eager
    * checkpoint materializes the (tiny, N-row) result while the edge cache
    * is still alive, so `run` can unpersist before returning. */
  private def singleTask(e: DataFrame, iters: Int, r0: Long,
                         dampNum: Long, dampDen: Long): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val teleport = ((dampDen - dampNum) * r0) / dampDen
    val out = e.as[(String, String, Long)](
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaLong))
      .coalesce(1)
      .mapPartitions { it =>
        val es = it.toArray
        val ids = new java.util.HashMap[String, Integer]()
        val names = scala.collection.mutable.ArrayBuffer[String]()
        def id(s: String): Int = {
          val got = ids.get(s)
          if (got ne null) got.intValue()
          else { ids.put(s, Integer.valueOf(names.size)); names += s; names.size - 1 }
        }
        val srcI = new Array[Int](es.length)
        val dstI = new Array[Int](es.length)
        val w = new Array[Long](es.length)
        var i = 0
        while (i < es.length) {
          srcI(i) = id(es(i)._1); dstI(i) = id(es(i)._2); w(i) = es(i)._3; i += 1
        }
        val n = names.size
        val outw = new Array[Long](n)
        i = 0; while (i < es.length) { outw(srcI(i)) += w(i); i += 1 }
        var rank = Array.fill(n)(r0)
        var it2 = 0
        while (it2 < iters) {
          val contrib = new Array[Long](n)
          i = 0
          while (i < es.length) {
            val u = srcI(i)
            if (outw(u) > 0) contrib(dstI(i)) += w(i) * (rank(u) / outw(u))
            i += 1
          }
          val next = new Array[Long](n)
          i = 0
          while (i < n) { next(i) = teleport + (dampNum * contrib(i)) / dampDen; i += 1 }
          rank = next; it2 += 1
        }
        names.indices.iterator.map(j => (names(j), rank(j)))
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("node", "rank")
    out.localCheckpoint(true)
  }

  /** The distributed Pregel loop (the >gate / 100 TB path). */
  private def supersteps(e: DataFrame, iters: Int, r0: Long,
                         dampNum: Long, dampDen: Long): DataFrame = {
    val teleport = ((dampDen - dampNum) * r0) / dampDen
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val eo = e.join(outw, "src").persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    try {
      var ranks = nodes.select(col("node"), lit(r0).as("rank"))
        .localCheckpoint(false)
      for (i <- 1 to iters) {
        val contrib = eo.join(ranks, eo("src") === ranks("node"))
          .select(eo("dst").as("cdst"), (col("w") * expr("rank DIV outw")).as("c"))
          .groupBy(col("cdst")).agg(sum(col("c")).as("contrib"))
        val next = nodes.join(contrib, nodes("node") === contrib("cdst"), "left")
          .select(col("node"),
            (lit(teleport) +
              expr(s"($dampNum * coalesce(contrib, CAST(0 AS BIGINT))) DIV $dampDen"))
              .as("rank"))
        // lazy checkpoints truncate lineage without a per-iteration job;
        // the LAST one is eager so the result exists before the caches die
        ranks = next.localCheckpoint(i == iters)
      }
      ranks
    } finally {
      eo.unpersist()
      nodes.unpersist()
    }
  }
}
