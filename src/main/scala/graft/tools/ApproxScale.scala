package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only rehearsal for graft.plans.ApproxDistinctRule's operational
  * claim: one conf flip turns a COUNT(DISTINCT)-heavy profiling query's
  * Expand-based exact-distinct plan into mergeable HLL sketches — no query
  * edit. Runs the same two-distinct profile (the q37 shape: every input
  * row expands ×2 for exact distinct) against widened events
  * (SPARK_GRAFT_SCALE_COPIES×, reusing TopKScale/ScaleSmoke's corpus dirs
  * when present) with the flag off and on, two passes each; prints wall
  * times, the plan's Expand presence, and the estimate error. */
object ApproxScale {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "64").toInt
    val out = s"/tmp/graft_approx$copies"
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$out/events.parquet/_SUCCESS").exists()) {
      val ev = spark.read.parquet(s"$sf/events.parquet")
      // user_id remapped per copy: distinct cardinality GROWS with copies
      // (the axis that makes exact distinct expensive)
      (0 until copies).map(i =>
          ev.withColumn("user_id", col("user_id") + lit(i * 1000000L))
            .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    val ev = graft.core.Tables.events(spark, out)
    println(s"[approx$copies] corpus: ${ev.count()} rows")

    def profile() = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("u"),
        countDistinct(col("event_id")).as("e"))

    def run(label: String): Array[(String, Long, Long, Long)] = {
      var res: Array[(String, Long, Long, Long)] = null
      for (pass <- Seq("cold", "warm")) {
        val df = profile()
        val t0 = System.nanoTime()
        res = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        val dt = (System.nanoTime() - t0) / 1e9
        val opt = df.queryExecution.optimizedPlan.toString()
        val expand = df.queryExecution.executedPlan.toString().contains("Expand")
        println(f"[approx$copies] $label $pass $dt%.2f s expand=$expand " +
          s"approxPlanned=${opt.contains("approx_count_distinct")}")
      }
      res
    }

    val exact = run("exact")
    spark.conf.set("spark.graft.approxDistinct", "true")
    val approx = run("approx")
    spark.conf.set("spark.graft.approxDistinct", "false")

    val byType = exact.map(t => t._1 -> t).toMap
    approx.foreach { case (k, _, u, e) =>
      val (_, _, ux, ex) = byType(k)
      println(f"[approx$copies] $k err(u)=${math.abs(u - ux).toDouble / ux}%.4f " +
        f"err(e)=${math.abs(e - ex).toDouble / ex}%.4f")
    }
    spark.stop()
  }
}
