package graft

import org.apache.spark.sql.functions._

/** q54_pps_sample (Sampling.scala): integer systematic PPS sampling.
  * Pins the defining invariant (Σ multiplicity = k per source — the lattice
  * has exactly k points), exact equality with a driver-side replica of the
  * lattice arithmetic, and determinism across runs.
  */
class PpsSampleSpec extends SparkSpec {

  private val K = 50L

  test("multiplicities sum to exactly k per source") {
    val out = graft.queries.Sampling.q54PpsSample(spark, sf001)
    val sums = out.groupBy(col("source")).agg(sum(col("mult")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.nonEmpty)
    assert(sums.values.forall(_ == K), s"per-source draw must be k=$K: $sums")
  }

  test("exact match with a driver-side replica of the lattice arithmetic") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      val ordered = rows.toSeq.sortBy(_._2)
      val w = ordered.map(_._3).sum
      var cum = 0L
      ordered.flatMap { case (_, docId, n) =>
        val a = cum; val b = cum + n; cum = b
        val lo = (2 * K * a + w - 1) / w
        val hi = (2 * K * b - 1) / w
        val mult = math.max(0L, (hi + 1) / 2 - lo / 2)
        if (mult >= 1) Some((src, docId, n, a, mult)) else None
      }
    }.toSet
    val got = graft.queries.Sampling.q54PpsSample(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
  }

  test("a doc longer than W/k tokens always draws (inclusion is PPS)") {
    // any doc covering ≥ W/k tokens spans at least one lattice gap, so its
    // interval must contain ≥ 1 point — check against the raw corpus
    val docs = graft.core.Tables.documents(spark, sf001)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val w = docs.groupBy(col("source")).agg(sum(col("n_toks")).as("w_total"))
    val must = docs.join(w, "source")
      .filter(col("n_toks") * lit(K) >= col("w_total"))
      .select(col("source"), col("doc_id"))
    val sampled = graft.queries.Sampling.q54PpsSample(spark, sf001)
      .select(col("source"), col("doc_id"))
    assert(must.exceptAll(sampled).count() === 0L)
  }

  test("plan shape: one window shuffle + broadcast totals only") {
    val plan = graft.queries.Sampling.q54PpsSample(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"totals should broadcast:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    assert(hashEx <= 2, // the source-window shuffle + the totals agg
      s"unexpected hash exchanges ($hashEx):\n$plan")
  }

  test("deterministic across runs") {
    val a = graft.queries.Sampling.q54PpsSample(spark, sf001).collect().toSeq
    val b = graft.queries.Sampling.q54PpsSample(spark, sf001).collect().toSeq
    assert(a === b)
  }
}
