package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational3

/** Audit for the 100 TB profile variant (q37_profile_approx): the HLL
  * swap's error envelope against the exact lane, and the plan property
  * that funds it — no Expand fan-out, single aggregation pass. */
class ProfileApproxSpec extends SparkSpec {

  test("q37_profile_approx stays inside the HLL error envelope vs the exact profile") {
    val dir = "/root/testdata/sf0.1"
    def byCol(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, String, String)] =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val exact = byCol(Relational3.q37Profile(spark, dir))
    val approx = byCol(Relational3.q37ProfileApprox(spark, dir))
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, (nulls, distinct, vmin, vmax)) =>
      val (aNulls, aDistinct, aMin, aMax) = approx(c)
      // nulls / min / max are exact aggregates — identical by definition
      assert(aNulls === nulls, s"$c nulls")
      assert(aMin === vmin, s"$c min")
      assert(aMax === vmax, s"$c max")
      // HLL++ at default rsd 0.05: allow 3 sigma plus integer slack for
      // tiny cardinalities (where HLL is exact-ish but rounding applies)
      val tol = math.max(2.0, 0.15 * distinct)
      assert(math.abs(aDistinct - distinct) <= tol,
        s"$c distinct: approx $aDistinct vs exact $distinct (tol $tol)")
    }
  }

  test("q37_profile_approx plans ONE aggregation pass with no Expand") {
    val df = Relational3.q37ProfileApprox(spark, "/root/testdata/sf0.01")
    df.collect() // finalize the adaptive plan before reading it
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"Expand fan-out found:\n$plan")
    // the exact lane's plan DOES expand — the contrast that motivates the swap
    val exact = Relational3.q37Profile(spark, "/root/testdata/sf0.01")
    exact.collect()
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
  }
}
