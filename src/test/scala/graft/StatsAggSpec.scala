package graft

import org.apache.spark.sql.functions._

/** Closes the q44 loop: Spark's NATIVE one-pass statistical aggregates
  * (corr, covar_samp, stddev_samp, var_samp) must agree with the lane's
  * exact decimal-power-sum formulation within float tolerance. The native
  * forms are what a user calls and what runs at 100 TB (mergeable
  * co-moments, no second pass); the decimal form is what the DuckDB
  * oracle can hash — this spec is the bridge that says they are the same
  * statistics. */
class StatsAggSpec extends SparkSpec {
  import spark.implicits._

  test("native corr/covar/stddev match the exact decimal-moment lane within 1e-9") {
    val dir = sf001
    val native = graft.core.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        var_samp($"l_quantity".cast("double")).as("var_qty"),
        stddev_samp($"l_quantity".cast("double")).as("std_qty"),
        covar_samp($"l_quantity".cast("double"), $"l_extendedprice".cast("double")).as("covar_qp"),
        corr($"l_quantity".cast("double"), $"l_extendedprice".cast("double")).as("corr_qp"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = graft.queries.Relational2.q44Stats(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(native.keySet === exact.keySet)
    for (g <- native.keySet; c <- Seq("var_qty", "std_qty", "covar_qp", "corr_qp")) {
      val a = native(g).getAs[Double](c)
      val b = exact(g).getAs[Double](c)
      // the lane floor-rounds to 9 decimals for cross-engine determinism,
      // so tolerate that grid (5e-10 absolute) on top of float noise
      val ok = math.abs(a - b) < 1e-8 ||
        math.abs(a - b) / math.max(1e-30, math.abs(b)) < 1e-6
      assert(ok, s"$g.$c native=$a exact=$b")
    }
  }
}
