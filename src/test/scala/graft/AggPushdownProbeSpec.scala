package graft

import org.apache.spark.sql.functions._

/** q39_agg_pushdown's lever, plan-asserted: under the V2 parquet source
  * with spark.sql.parquet.aggregatePushdown=true, an unfiltered
  * COUNT/MIN/MAX compiles to `PushedAggregation` on the BatchScan and is
  * answered from row-group footer statistics — no data pages read. The
  * spec pins (1) the pushdown actually engages, (2) footer-served
  * numbers equal a full-scan recompute, (3) the lane's conf hygiene: it
  * must leave the session's source selection and pushdown flag exactly
  * as it found them (a leaked useV1SourceList silently flips every later
  * lane's parquet source to V2).
  */
class AggPushdownProbeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("COUNT/MIN/MAX is served from footers (PushedAggregation on the scan)") {
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      val df = spark.read.parquet(s"$dir/lineitem.parquet")
        .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("mn"),
          max(col("l_quantity")).as("mx"))
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("PushedAggregation: [COUNT(*), MIN(l_quantity), MAX(l_quantity)]"),
        s"aggregate not pushed:\n$plan")
      val pushed = df.head()
      // full-scan recompute under the untouched (V1) session defaults
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      val full = spark.read.parquet(s"$dir/lineitem.parquet")
        .agg(count(lit(1)), min(col("l_quantity")), max(col("l_quantity"))).head()
      assert(pushed.getLong(0) == full.getLong(0) &&
        pushed.getDouble(1) == full.getDouble(1) &&
        pushed.getDouble(2) == full.getDouble(2),
        s"footer stats diverge from scan: $pushed vs $full")
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
  }

  test("a filter on a data column disables the pushdown (the lever's boundary)") {
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      val plan = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_orderkey") > 100)
        .agg(count(lit(1)))
        .queryExecution.executedPlan.toString()
      assert(!plan.contains("PushedAggregation: [COUNT"),
        "filtered aggregate must NOT claim footer service")
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
  }

  test("the lane restores source selection and pushdown flag (no conf leak)") {
    val v1Before = spark.conf.get("spark.sql.sources.useV1SourceList")
    val aggBefore = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    val out = graft.queries.Relational3.q39AggPushdown(spark, dir).collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).toSeq == Seq("events", "lineitem", "orders"))
    assert(spark.conf.get("spark.sql.sources.useV1SourceList") == v1Before)
    assert(spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
      .getOrElse("false") == aggBefore.getOrElse("false"))
  }
}
