package graft

import org.apache.spark.sql.functions._

/** Mergeability proof for the percentile sketches behind q34_outliers /
  * q34_gaps' documented 10¹²-row variant — the quantile counterpart of
  * HllMergeSpec. Spark's approx_percentile is a Greenwald-Khanna summary
  * whose PARTIAL AGGREGATION IS sketch union (each partition builds a
  * summary, the final agg merges them), and its guarantee is on RANK
  * error: |rank(v̂) − ⌈p·n⌉| ≤ n / accuracy, for ANY merge topology. That
  * rank bound — not value equality — is the property a 10¹²-row
  * deployment leans on, so that is what this spec pins: the estimate's
  * realized rank stays inside the envelope for every partition layout,
  * globally and per group. */
class PercentileMergeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val Accuracy = 100 // ε = 1/accuracy = 1% rank error — tight enough to bite at sf0.01

  private def values = graft.core.Tables.events(spark, dir)
    .select(col("value").cast("double").as("v"), col("event_type"))
    .filter(col("v").isNotNull)

  /** Realized rank of v̂ within the column (count of values ≤ v̂). */
  private def rankOf(vHat: Double): Long =
    values.filter(col("v") <= vHat).count()

  test("approx_percentile's rank error stays inside n/accuracy for every slice topology") {
    val n = values.count()
    val eps = n.toDouble / Accuracy
    for (p <- Seq(0.5, 0.95); parts <- Seq(1, 3, 8, 32)) {
      val vHat = values.repartition(parts)
        .agg(expr(s"approx_percentile(v, $p, $Accuracy)").cast("double"))
        .head().getDouble(0)
      val rank = rankOf(vHat)
      val target = math.ceil(p * n)
      assert(math.abs(rank - target) <= eps,
        s"p=$p parts=$parts: rank $rank vs target $target (ε=$eps)")
    }
  }

  test("per-group percentile sketches respect the rank bound under map-side partials") {
    val byType = values.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr(s"approx_percentile(v, 0.95, $Accuracy)").cast("double").as("vhat"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(byType.nonEmpty)
    byType.foreach { case (t, n, vHat) =>
      val rank = values.filter(col("event_type") === t && col("v") <= vHat).count()
      val target = math.ceil(0.95 * n)
      assert(math.abs(rank - target) <= n.toDouble / Accuracy + 1,
        s"type=$t: rank $rank vs target $target (n=$n)")
    }
  }

  test("sketch merge is deterministic for a fixed topology (same layout, same estimate)") {
    def once(): Double = values.repartition(8, col("event_type"))
      .agg(expr(s"approx_percentile(v, 0.5, $Accuracy)").cast("double"))
      .head().getDouble(0)
    assert(once() === once(),
      "same data + same hash layout must merge to the identical estimate")
  }
}
