package graft

import graft.queries.Relational

/** Error-bound + mergeability audit for the HLL lanes (q13_approx_distinct,
  * q13_hll_merge) — rows-only in the driver's oracle gate by design, so the
  * evidence lives here: partition-wise sketch union must equal the global
  * sketch EXACTLY (the property the q37 100 TB COUNT DISTINCT swap-in
  * relies on), independent of slice topology, and land inside the HLL
  * standard-error envelope of the exact count. */
class HllMergeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("unioned per-slice sketches equal the global sketch exactly, within error of exact") {
    val r = Relational.q13HllMerge(spark, dir).head()
    assert(r.getBoolean(4), // merge_lossless
      s"sketch union diverged from the direct sketch: merged=${r.getLong(0)} direct=${r.getLong(1)}")
    // default lgK=12 → σ ≈ 1.04/√4096 ≈ 1.6%; 5% is > 3σ
    assert(r.getDouble(3) < 0.05, s"rel_err ${r.getDouble(3)} outside the HLL error envelope")
  }

  test("the merged estimate is slice-topology independent (3-way ≡ 8-way union)") {
    val a = Relational.q13HllMergeSliced(spark, dir, 3).head()
    val b = Relational.q13HllMergeSliced(spark, dir, 8).head()
    assert(a.getLong(0) === b.getLong(0))
    assert(a.getBoolean(4) && b.getBoolean(4))
  }

  test("the sketch-merge cross stays a broadcast NLJ when auto-broadcast is off") {
    // r9 join-shape audit: the unhinted one-row crossJoin degraded to
    // CartesianProduct under no-broadcast confs; the explicit broadcast()
    // hint must pin the shape independent of any threshold.
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = Relational.q13HllMerge(spark, dir)
      df.collect() // finalize the adaptive plan before reading it
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian found:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("q13's approx_count_distinct stays inside its error envelope per group") {
    import org.apache.spark.sql.functions._
    val approx = Relational.q13(spark, dir) // (day, approx_users)
    val exact = graft.core.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val bad = approx.join(exact, "day")
      .filter(abs(col("approx_users") - col("exact_users")).cast("double") /
        col("exact_users").cast("double") > 0.15) // rsd default 5%; 15% ⇒ 3σ
      .count()
    assert(bad === 0L)
  }
}
