package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew-join splitting — the automatic half of the skew story
  * (`core.SkewJoin` is the manual salting escape hatch for when it can't
  * help, e.g. aggregation keys). A shuffle join whose key distribution
  * puts most rows in one partition gets that partition SPLIT at runtime
  * into advisory-sized slices, each joined against a duplicated read of
  * the other side — no plan change, no salting, driven purely by the
  * runtime map-output statistics. At 100 TB this is what turns "one task
  * runs for hours on the viral key" into N parallel tasks. The fixture
  * forces the shape (tiny thresholds, broadcast off) and asserts the
  * executed plan actually marked the join skew=true.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed shuffle join at runtime") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // fixture-sized skew detection: a partition is skewed when it beats
      // 2x the median AND 64 KB; split into ~32 KB slices
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768") {
      // left: 100k rows, 90% on the single hot key 1
      val left = spark.range(0, 100000)
        .select(when($"id" < 90000, lit(1L)).otherwise($"id").as("k"),
          $"id".as("v"))
      val right = spark.range(0, 1000).select($"id".as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k")
      val rows = joined.collect() // collect() finalizes the adaptive plan
      // only the hot key matches the dim (the scatter keys are >= 90000,
      // outside the dim's range): 90k rows, every one through the split
      assert(rows.length === 90000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n${plan.take(3000)}")
    }
  }
}
