package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only rehearsal: the q50 custom TopKPerKey operator vs the
  * q15_rank_topk window plan on a widened orders table — the measured
  * backing for the "bounded-heap partial caps the exchange" claim.
  * Self-unions sf0.1 orders `SPARK_GRAFT_SCALE_COPIES`× with o_orderkey
  * remapped (uniqueness/tiebreak) and o_custkey KEPT (group depth grows
  * with copies — the axis where the window plan's shuffle-everything cost
  * diverges from the partial's ≤ k·keys·partitions bound). Prints wall
  * times (two passes: cold/warm), the partial phase's output-row metric,
  * and the input row count, one parse-friendly line per measurement. */
object TopKScale {
  private def collectPhysical(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => collectPhysical(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan).flatMap(collectPhysical)
    case p => p +: p.children.flatMap(collectPhysical)
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "64").toInt
    val out = s"/tmp/graft_topk$copies"
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$out/orders.parquet/_SUCCESS").exists()) {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      (0 until copies).map(i =>
          o.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    }
    val orders = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val nIn = orders.count()
    val nKeys = orders.select("o_custkey").distinct().count()
    println(s"[topk$copies] corpus: $nIn rows, $nKeys keys")

    def time(label: String, mk: () => DataFrame): DataFrame = {
      var df: DataFrame = null
      for (pass <- Seq("cold", "warm")) {
        df = mk()
        val t0 = System.nanoTime()
        val n = df.collect().length
        println(f"[topk$copies] $label $pass ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      df
    }

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    time("window", () => orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn"))

    val custom = time("custom", () => graft.plans.GraftPlans.topKPerKey(
      orders, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3))
    val partialRows = collectPhysical(custom.queryExecution.executedPlan)
      .collect { case t: graft.plans.TopKPerKeyExec if t.partial => t }
      .map(_.metrics("numOutputRows").value).sum
    println(s"[topk$copies] custom partial->exchange rows: $partialRows " +
      s"(window shuffles all $nIn)")
    spark.stop()
  }
}
