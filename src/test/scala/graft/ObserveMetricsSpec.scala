package graft

import org.apache.spark.sql.functions._

/** `Dataset.observe()` — the in-plan data-quality hook a production
  * pipeline hangs its row-count/invariant telemetry on: metrics are
  * computed INSIDE the executing plan (CollectMetrics, map-side, no extra
  * job, no second scan) and surface on the driver after any action. At
  * 100 TB that property is the whole point — auditing a bronze write's
  * row count or null rate must not re-scan the input. The batch form is
  * asserted here; the same call is the streaming telemetry surface
  * (StreamingQueryProgress.observedMetrics) on every micro-batch.
  */
class ObserveMetricsSpec extends SparkSpec {

  test("observe() computes audit metrics in-plan, matching a direct aggregation") {
    val dir = sf001
    val docs = graft.core.Tables.documents(spark, dir)
    val observed = docs.observe("doc_audit",
      count(lit(1)).as("n_rows"),
      count(col("text")).as("n_text"),
      sum(col("n_chars")).as("total_chars"))
    // collect() executes THIS dataset's QueryExecution, which is where the
    // observed metrics surface (count() plans a separate aggregation whose
    // QE would carry them instead — a first-use trap worth pinning here)
    val nOut = observed.collect().length.toLong
    val m = observed.queryExecution.observedMetrics("doc_audit")
    val direct = docs.agg(
      count(lit(1)).as("n_rows"),
      count(col("text")).as("n_text"),
      sum(col("n_chars")).as("total_chars")).collect().head
    assert(m.getAs[Long]("n_rows") === direct.getAs[Long]("n_rows"))
    assert(m.getAs[Long]("n_text") === direct.getAs[Long]("n_text"))
    assert(m.getAs[Long]("total_chars") === direct.getAs[Long]("total_chars"))
    // observe() must not change the data it rode on
    assert(nOut === docs.count())
  }
}
