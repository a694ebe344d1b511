package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled storage so repeated joins/aggs on the bucket key
  * plan with NO Exchange — the 100 TB answer to "this join runs every hour
  * on the same key". Verified by inspecting the physical plan of a join
  * between two tables bucketed on the join key.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join between co-bucketed tables plans without a shuffle Exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    val li = graft.core.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val o = graft.core.Tables.orders(spark, sf001)
      .select($"o_orderkey", $"o_totalprice")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bkt")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bkt")
    try {
      // disable broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still answers correctly
      val expected = li.join(o, $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
