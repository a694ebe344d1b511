package graft

import org.apache.spark.sql.functions._
import graft.core.ConnectedComponents

/** CC label propagation on shapes where the answer is known by hand —
  * including the hub-and-spoke graph where CC and greedy keep-first
  * genuinely disagree. */
class ConnectedComponentsSpec extends SparkSpec {

  /** localMax = -1 forces the distributed superstep path; the default runs
    * the size-gated single-task union-find (all spec graphs are tiny). */
  private def labelsOf(vs: Seq[Long], es: Seq[(Long, Long)],
                       localMax: Long = ConnectedComponents.LocalSolveMaxEdges): Map[Long, Long] = {
    import spark.implicits._
    val vertices = vs.toDF("v")
    val edges = es.toDF("src", "dst")
    ConnectedComponents.labels(vertices, edges, localSolveMaxEdges = localMax)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("clique + chain + isolated vertex resolve to component minima (both paths)") {
    // clique {1,2,3}, chain 10-11-12-13 (diameter 3), isolated 20
    val vs = Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 20L)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L)
    assert(labelsOf(vs, es) == expected)               // local union-find path
    assert(labelsOf(vs, es, localMax = -1) == expected) // superstep path
  }

  test("hub-and-spoke: CC evicts a vertex greedy keep-first would keep") {
    // edges 1-3 and 2-3: vertex 2 has no smaller NEIGHBOUR (greedy keeps it)
    // but is not its component's minimum (CC evicts it)
    val labels = labelsOf(Seq(1L, 2L, 3L), Seq((1L, 3L), (2L, 3L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // greedy policy on the same graph, for contrast: evicted = has a
    // smaller neighbour = {3}; so greedy survivors {1,2} vs CC survivors {1}
    val greedySurvivors = Set(1L, 2L)
    val ccSurvivors = labels.collect { case (v, l) if v == l => v }.toSet
    assert(ccSurvivors != greedySurvivors && ccSurvivors == Set(1L))
  }

  test("long chain converges within the superstep budget") {
    val n = 12 // diameter 11: pointer jumping needs ~log2(11) supersteps
    val vs = (0L until n).toSeq
    val es = (0L until n - 1).map(i => (i, i + 1))
    val labels = labelsOf(vs, es, localMax = -1) // must exercise supersteps
    assert(labels.values.toSet == Set(0L))
  }

  test("insufficient superstep budget fails loudly, never silently partial") {
    import spark.implicits._
    // 200-vertex path: needs ~log(diameter) batches, far more than 1
    val vs = (0L until 200L).toDF("v")
    val es = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.labels(vs, es, maxIters = 1, localSolveMaxEdges = -1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("converged-at-the-cap graph is rescued by the exact recheck, not failed") {
    import spark.implicits._
    // A 9-path converges WITHIN one batch's back half: the second hook
    // accumulator reads > 0 (it still lowered labels mid-batch) but the
    // trailing jumps finish the job. The accumulator alone would throw at
    // maxIters = 1; the exact retry-safe recheck must recognize the labels
    // as converged and return them.
    val vs = (0L until 9L).toDF("v")
    val es = (0L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = ConnectedComponents.labels(vs, es, maxIters = 1, localSolveMaxEdges = -1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet === Set(0L))
  }

  test("contraction exit solves a clique+chain mix in one batch, labels exact") {
    // gate = 1: the 30-edge graph enters the superstep loop; after batch 1
    // the clique collapses and the chain's residual cluster graph is tiny,
    // so the contraction exit must fire and still produce exact minima
    val vs = (0L until 40L).toSeq
    val es = (for { a <- 0L until 10L; b <- a + 1 until 10L } yield (a, b)) ++ // clique 0..9
      (20L until 39L).map(i => (i, i + 1)) // chain 20..39
    val labels = labelsOf(vs, es, localMax = 1)
    assert((0L until 10L).forall(labels(_) == 0L))
    assert((20L to 39L).forall(labels(_) == 20L))
    assert(labels(15L) === 15L) // isolated
  }

  /** Reference union-find, the simplest possible correct implementation. */
  private def unionFind(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
    def find(v: Long): Long = { if (parent(v) != v) parent(v) = find(parent(v)); parent(v) }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress fully, then the root IS the component min because unions
    // always parent the larger root under the smaller
    vs.map(v => v -> find(v)).toMap
  }

  test("property: BOTH paths match a union-find oracle on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    val gen = for {
      n <- Gen.choose(2, 24)
      nEdges <- Gen.choose(0, 30)
      es <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L) if a != b
      } yield (a, b))
    } yield ((0L until n).toSeq, es)
    val prop = Prop.forAllNoShrink(gen) { case (vs, es) =>
      val oracle = unionFind(vs, es)
      labelsOf(vs, es) == oracle &&           // local union-find path
        labelsOf(vs, es, localMax = -1) == oracle && // pure superstep path
        labelsOf(vs, es, localMax = 1) == oracle // superstep + contraction exit
    }
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
