package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-core by iterative peeling, with FIXED-ROUND semantics.
  *
  * The operator is defined as "R rounds of peeling" (drop every node whose
  * degree within the surviving set is < k, R times), NOT "peel to
  * fixpoint": a fixpoint operator has a data-dependent round count that no
  * portable SQL oracle can replay, while R fixed rounds unroll into R
  * chained CTEs exactly (the q55_pagerank discipline). A `converged`
  * column reports whether the fixpoint was reached within R — when true,
  * the output IS the true k-core (further rounds are identity); when
  * false, the output is still perfectly defined and cross-engine
  * reproducible. Peeling is monotone (each round's set ⊆ previous), so
  * set stability is detectable by COUNT equality, and early exit on a
  * stable round is semantically identical to running all R.
  *
  * Scale shape: each round is two semi-join-shaped equi-joins of the
  * symmetric edge list against the (shrinking) survivor set plus one
  * map-side-combining degree count — AQE broadcasts the survivor frame
  * once it is small, plain shuffle joins before that. Lineage is
  * truncated per round with eager localCheckpoints (the
  * ConnectedComponents/PageRank superstep discipline); rounds cost
  * O(|E|) each, never more.
  */
object KCore {

  /** Survivors of `rounds` peeling rounds at threshold `k`, with their
    * degree inside the final set. `edges` columns: integral `a`, `b`,
    * a < b, deduplicated. Output: (node, deg, converged). */
  def core(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame = {
    val edges = edgesIn.localCheckpoint(true)
    val sym = edges.select(col("a").as("node"), col("b").as("other"))
      .unionAll(edges.select(col("b").as("node"), col("a").as("other")))
      .localCheckpoint(true)

    def degWithin(nodes: DataFrame): DataFrame = sym
      .join(nodes, Seq("node"))
      .join(nodes.select(col("node").as("other")), Seq("other"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    var nodes = sym.select(col("node")).distinct().localCheckpoint(true)
    var prev = nodes.count()
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      val next = degWithin(nodes)
        .filter(col("deg") >= k).select(col("node"))
        .localCheckpoint(true)
      val n = next.count()
      converged = n == prev
      prev = n
      nodes = next
      r += 1
    }
    degWithin(nodes)
      .select(col("node"), col("deg"), lit(converged).as("converged"))
  }
}
