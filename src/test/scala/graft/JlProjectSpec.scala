package graft

import org.apache.spark.sql.functions._

/** q56_jl_project: the hash-deterministic Achlioptas projection. Pins the
  * JL property empirically (pairwise squared-distance distortion bounded on
  * real embeddings), the matrix density, determinism, and the norm2 column
  * being exactly the sum of squared outputs.
  */
class JlProjectSpec extends SparkSpec {

  test("matrix density ≈ 1/3 nonzero and both signs appear") {
    val cells = for (i <- 0 until 64; j <- 0 until 16)
      yield graft.functions.Hash60(s"$i:$j") % 6
    val plus = cells.count(_ == 0); val minus = cells.count(_ == 1)
    val nz = (plus + minus).toDouble / cells.size
    assert(nz > 0.25 && nz < 0.42, s"nonzero fraction $nz")
    assert(plus > 0 && minus > 0)
  }

  test("JL property: pairwise squared distances preserved within 60%") {
    val out = graft.queries.Similarity.q56JlProject(spark, sf001)
    val cols = (0 until 16).map(j => f"p$j%02d")
    val proj = out.select((col("vec_id") +: cols.map(col)): _*)
      .collect().map(r => r.getLong(0) -> cols.indices.map(i => r.getDouble(i + 1)).toArray)
    val orig = graft.core.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val sample = proj.take(30)
    val ratios = for {
      (ia, pa) <- sample; (ib, pb) <- sample if ia < ib
      dOrig = d2(orig(ia), orig(ib)) if dOrig > 0
    } yield d2(pa, pb) / dOrig
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean")
    // k=16 gives a wide JL tail (ε ~ √(8·ln n / k)); measured 92.6% of
    // pairs inside the ±60% band on this corpus — pin a floor below that
    assert(ratios.count(r => r > 0.4 && r < 1.6).toDouble / ratios.size > 0.85,
      "more than 15% of pairs outside the 60% distortion band")
  }

  test("plan shape: map-only — no hash exchange, whole-stage codegen") {
    val plan = graft.queries.Similarity.q56JlProject(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"projection must not shuffle:\n$plan")
    // map-only: one scan, pure Projects, no agg/window/join anywhere
    // (the AQE pre-execution string carries no codegen markers, so the
    // operator inventory is the check)
    assert(!plan.contains("Aggregate") && !plan.contains("Window") &&
      !plan.contains("Join"), s"non-map operator leaked in:\n$plan")
    assert("FileScan parquet".r.findAllMatchIn(plan).size === 1)
  }

  test("norm2 equals the exact sum of squared projections; deterministic") {
    val out = graft.queries.Similarity.q56JlProject(spark, sf001)
    val cols = (0 until 16).map(j => f"p$j%02d")
    val bad = out.withColumn("chk",
        expr(cols.map(n => s"$n * $n").mkString(" + ")))
      .filter(col("chk") =!= col("norm2")).count()
    assert(bad === 0L)
    val a = out.collect().map(_.toSeq)
    val b = graft.queries.Similarity.q56JlProject(spark, sf001).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
