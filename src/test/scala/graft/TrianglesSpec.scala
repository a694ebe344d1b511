package graft

import org.apache.spark.sql.DataFrame

/** Degree-oriented triangle counting (core/Triangles.scala): closed-form
  * fixtures (complete graph, star, bowtie), a brute-force replica on seeded
  * random graphs, and hub robustness — the graph shape the orientation
  * exists for.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = {
    val norm = es.map { case (x, y) => if (x < y) (x, y) else (y, x) }.distinct
    norm.toDF("a", "b")
  }

  private def run(es: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    graft.core.Triangles.nodeTriangles(edgesDf(es))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Brute-force per-node triangle counts for exact compare. */
  private def replica(es: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val norm = es.map { case (x, y) => if (x < y) (x, y) else (y, x) }.distinct
    val adj = (norm ++ norm.map(_.swap)).groupBy(_._1)
      .map { case (n, ps) => n -> ps.map(_._2).toSet }
    val nodes = adj.keys.toSeq
    val tris = for {
      a <- nodes; b <- adj(a) if b > a; c <- adj(b) if c > b && adj(a)(c)
    } yield Seq(a, b, c)
    val perNode = tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    nodes.map(n => n -> (adj(n).size.toLong, perNode.getOrElse(n, 0L))).toMap
  }

  test("K4: every node has degree 3 and sits in 3 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = run(k4)
    assert(got.size === 4)
    got.values.foreach { case (deg, tri) => assert(deg === 3L && tri === 3L) }
  }

  test("star: triangle-free at any hub degree, zero counts everywhere") {
    val star = (1L to 40L).map(i => (0L, i))
    val got = run(star)
    assert(got(0L) === ((40L, 0L)))
    (1L to 40L).foreach(i => assert(got(i) === ((1L, 0L))))
  }

  test("bowtie: shared corner counts both triangles, wings count one") {
    val bowtie = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
    val got = run(bowtie)
    assert(got(3L)._2 === 2L)
    Seq(1L, 2L, 4L, 5L).foreach(n => assert(got(n)._2 === 1L))
  }

  test("seeded random graphs: exact match with the brute-force replica") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(160)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
        .filter { case (x, y) => x != y }
      assert(run(es) === replica(es), s"seed $seed diverged")
    }
  }

  test("hub graph: high-degree node with attached triangles counts exactly") {
    // hub 0 touches 60 leaves; triangles only among leaf pairs (i, i+1)
    // for even i — the orientation sends all hub edges INTO the hub, so
    // the hub contributes wedge work only through its low-degree corners.
    val leaves = (1L to 60L).map(i => (0L, i))
    val rungs = (1L to 59L by 2).map(i => (i, i + 1))
    val got = run(leaves ++ rungs)
    assert(got(0L)._1 === 60L)
    assert(got(0L)._2 === 30L) // one triangle per rung
    (1L to 60L).foreach(i => assert(got(i)._2 === 1L))
  }
}
