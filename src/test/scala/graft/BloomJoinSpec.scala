package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the third scan-reduction lever after
  * static partition pruning (q39_partition_prune) and dynamic partition
  * pruning (q39_dynamic_prune), and the one that works on UNPARTITIONED
  * join keys: Spark's InjectRuntimeFilter builds a bloom filter from the
  * selective (dim) side of a shuffle join and probes it map-side on the
  * fact scan, so non-joining fact rows die before the shuffle. At 100 TB
  * that is the difference between shuffling the whole fact table and
  * shuffling the joining slice. The production thresholds (creation side
  * ≤ 10 MB, application side ≥ 10 GB scan) are exactly the 100 TB shape;
  * the fixture is far below them, so this spec lowers the application-side
  * threshold to prove the rule PLANTS on our plans, and checks values are
  * unchanged by the probe.
  */
class BloomJoinSpec extends SparkSpec {

  test("runtime bloom filter plants a might_contain probe on the fact side of a shuffle join") {
    val dir = sf001
    // no broadcast: the rule targets shuffle joins (a broadcastable dim at
    // fixture scale would short-circuit the 100 TB shape under test)
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val fact = graft.core.Tables.lineitem(spark, dir)
      val dim = graft.core.Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F") // the selective creation side
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom-filter probe in the optimized plan:\n${optimized.take(3000)}")
      // the probe is a pure prefilter: values must equal the unfiltered join
      val withBloom = joined.collect().head
      val plain = withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        fact.join(dim, col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
          .collect().head
      }
      assert(withBloom === plain)
    }
  }
}
