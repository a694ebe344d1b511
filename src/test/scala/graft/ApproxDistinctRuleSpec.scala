package graft

import org.apache.spark.sql.functions._

/** graft.plans.ApproxDistinctRule — the injectOptimizerRule leg of
  * GraftExtensions: conf-gated COUNT(DISTINCT)→HLL++ policy rewrite.
  * Pins: (1) default OFF — exact distinct survives; (2) ON — the
  * optimized plan carries approx_count_distinct and the result equals a
  * direct approx_count_distinct call (same sketch, same rsd); (3) the
  * rewritten aggregate keeps its resultId, so downstream references
  * (aliases, sorts, filters) resolve unchanged; (4) multi-argument
  * COUNT(DISTINCT a, b) is out of scope and stays exact.
  */
class ApproxDistinctRuleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def ev = graft.core.Tables.events(spark, dir)

  test("flag off (default): COUNT(DISTINCT) stays exact") {
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val direct = ev.select(col("user_id")).distinct().count()
    assert(exact == direct)
  }

  test("flag on: plan rewrites to approx_count_distinct; result matches the direct sketch; references hold") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val df = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("u"))
        .filter(col("u") > 0)            // downstream reference on the alias
        .orderBy(col("event_type"))
      val opt = df.queryExecution.optimizedPlan.toString()
      assert(opt.contains("approx_count_distinct"), s"no rewrite in:\n$opt")
      assert(!opt.contains("count(distinct"), s"exact distinct survived in:\n$opt")
      val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
      spark.conf.set("spark.graft.approxDistinct", "false")
      val want = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.05).as("u"))
        .filter(col("u") > 0)
        .orderBy(col("event_type"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq == want.toSeq,
        s"rewritten ${got.toSeq} vs direct sketch ${want.toSeq}")
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }

  test("types HLL++ cannot hash stay exact instead of dying in the executor") {
    // The post-analysis rewrite skips re-analysis and HLL++'s own
    // checkInputDataTypes accepts everything (probed) — but its per-row
    // xxhash64 update throws on VariantType. Unguarded, the swapped
    // COUNT(DISTINCT v) analyzes fine and dies at execution with an
    // opaque task failure; the rule's hashability guard leaves it exact.
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val df = ev.select(parse_json(
          concat(lit("""{"t":""""), col("event_type"), lit("\"}"))).as("v"))
        .select(count_distinct(col("v")).as("n"))
      val opt = df.queryExecution.optimizedPlan.toString()
      // plan-only assertion: stock Spark's EXACT count(distinct variant)
      // also fails at runtime (the distinct shuffle cannot hash
      // VariantVal) — the rule's contract is that the flag CHANGES
      // NOTHING for unhashable types, not that it repairs stock Spark
      assert(opt.contains("count(distinct"), s"variant count was rewritten:\n$opt")
      // precision check: types the hash CAN walk still rewrite (maps hash
      // fine in Spark 4 — the guard must not over-block)
      val mapDf = ev.select(map(col("event_type"), col("user_id")).as("m"))
        .select(count_distinct(col("m")).as("n"))
      val mopt = mapDf.queryExecution.optimizedPlan.toString()
      assert(mopt.contains("approx_count_distinct"), s"map count not rewritten:\n$mopt")
      assert(mapDf.head().getLong(0) > 0)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }

  test("multi-argument COUNT(DISTINCT a, b) is out of scope and stays exact") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val df = ev.select(countDistinct(col("user_id"), col("event_type")).as("n"))
      val opt = df.queryExecution.optimizedPlan.toString()
      assert(opt.contains("count(distinct"), s"multi-arg was rewritten:\n$opt")
      val n = df.head().getLong(0)
      spark.conf.set("spark.graft.approxDistinct", "false")
      val exact = ev.select(col("user_id"), col("event_type")).distinct().count()
      assert(n == exact)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }
}
