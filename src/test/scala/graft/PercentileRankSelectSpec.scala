package graft

import org.apache.spark.sql.functions._

/** q20_percentile's rank-select rewrite: the distributed formulation must be
  * BIT-IDENTICAL to Spark's built-in exact `percentile(...)` (same sorted-
  * multiset position, same interpolation arithmetic) — otherwise the
  * rewrite silently changed lane semantics.
  */
class PercentileRankSelectSpec extends SparkSpec {

  private def builtin(dir: String) =
    graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.75)").as("p75"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      .orderBy(col("l_returnflag"))

  test("rank-select equals built-in percentile bit-for-bit (sf0.001)") {
    val got = graft.queries.Relational2.q20Percentile(spark, sf001).collect()
    val ref = builtin(sf001).collect()
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (g, r) =>
      assert(g.getString(0) === r.getString(0))
      (1 to 5).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(g.getDouble(i)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(i)),
          s"col $i of group ${g.getString(0)}: ${g.getDouble(i)} vs ${r.getDouble(i)}")
      }
    }
  }

  test("hand frames: singleton, two-value, heavy-tie groups match built-in") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0),
      ("c", 5.0), ("c", 5.0), ("c", 5.0), ("c", 7.0), ("c", 1.0)).toDF("g", "v")
    val got = graft.queries.Relational2.rankSelectPercentiles(df, "g", "v").collect()
    df.createOrReplaceTempView("pr_tiny")
    val ref = spark.sql(
      """SELECT g, percentile(v, 0.25) p25, percentile(v, 0.5) p50,
        |       percentile(v, 0.75) p75, min(v) mn, max(v) mx
        |FROM pr_tiny GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq ===
      ref.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq)
    // the singleton group returns its value at every percentile
    assert(got.head.getDouble(1) === 10.0 && got.head.getDouble(3) === 10.0)
  }
}
