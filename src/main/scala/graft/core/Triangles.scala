package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-oriented wedge join.
  *
  * Input: an undirected simple graph as a DataFrame of edges `(a, b)` with
  * `a < b`, one row per edge (no duplicates, no self-loops). Output: one
  * row per node `(node, deg, tri_cnt)` — degree and the number of
  * triangles the node participates in.
  *
  * The load-bearing scale move is DEGREE ORIENTATION (the classic fix for
  * "the curse of the last reducer"): each undirected edge is directed from
  * its lower-(degree, id) endpoint to the higher one, so every triangle is
  * enumerated exactly once, at its lowest-degree corner. Wedge generation
  * costs Σ_u C(outdeg(u), 2) where outdeg is bounded by the graph's
  * arboricity (≈ √m on any graph), NOT by the hub degree: a hub with 10⁶
  * neighbors in a 100 TB co-occurrence graph generates no wedges of its
  * own — its edges all point INTO it, and the wedges that close through it
  * are charged to their low-degree corners. Without orientation the same
  * hub would emit C(10⁶, 2) ≈ 5·10¹¹ wedges from one key — the one
  * straggler that kills the stage.
  *
  * Every stage is an equi-join or a map-side-combining count (shuffle on
  * node key, AQE-splittable); ranks are (deg, id) STRUCTS compared
  * lexicographically, so there is no packed-bigint overflow cap on either
  * degree or id at any scale.
  */
object Triangles {

  /** Per-node triangle participation counts. `edges` must have integral
    * columns `a`, `b` with `a < b`, deduplicated. */
  def nodeTriangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    // Total order low→high: lexicographic (degree, id). Unique by id.
    val rank = deg.select(col("node"),
      struct(col("deg"), col("node")).as("rk"))

    val oriented = edges
      .join(rank.select(col("node").as("a"), col("rk").as("rka")), Seq("a"))
      .join(rank.select(col("node").as("b"), col("rk").as("rkb")), Seq("b"))
      .select(
        when(col("rka") < col("rkb"), col("a")).otherwise(col("b")).as("u"),
        when(col("rka") < col("rkb"), col("b")).otherwise(col("a")).as("v"),
        greatest(col("rka"), col("rkb")).as("rkv"))

    // Wedges at the low corner: pairs of out-neighbors, ordered by rank so
    // each unordered pair appears once; closed by probing the oriented
    // edge (v, w) — which, when it exists, is directed v→w because
    // rk(v) < rk(w) by construction of the wedge.
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rkv") < col("e2.rkv"))
      .select(col("e1.u").as("u"), col("e1.v").as("v"), col("e2.v").as("w"))
    val tris = wedges.join(
        oriented.select(col("u").as("v"), col("v").as("w")).as("c"),
        Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))

    val corners = tris.select(col("u").as("node"))
      .unionAll(tris.select(col("v").as("node")))
      .unionAll(tris.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))

    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"))
  }
}
