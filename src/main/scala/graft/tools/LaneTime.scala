package graft.tools

/** Dev-only generic lane timer: run named SparkEntry lanes against
  * SPARK_GRAFT_SF_DIR (any dir with the right tables — testdata sf dirs or
  * a /tmp widened corpus), cold + N warm passes each, one parse-friendly
  * line per pass. Replaces per-rehearsal one-off timing mains.
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_scale32 \
  *          runMain graft.tools.LaneTime q51_range_join q53_overlap_join */
object LaneTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warms = sys.env.getOrElse("SPARK_GRAFT_WARM_PASSES", "2").toInt
    // A/B lever for the splitHotBuckets size gate (sbt's forked run JVM
    // doesn't inherit -D flags, so the dev tool bridges from the env);
    // production mains refuse the property — this tool is never one
    sys.env.get("SPARK_GRAFT_HOTKEY_GATE")
      .foreach(v => sys.props("graft.hotkey.gate.bytes") = v)
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    require(args.nonEmpty, "pass lane names")
    // r15 VERDICT task 8: collect()-based timing lets Catalyst prune
    // columns the action does not need — the exact instrument class that
    // hid the inherited q93 regression from the r14→r15 interrupted
    // session. The banner is loud by design; the gated metric lives in
    // tools/NoopTime.
    System.err.println("[lanetime] WARNING: times collect(), which PRUNES " +
      "columns — NOT the gated noop metric; use graft.tools.NoopTime for " +
      "any number that feeds an optimization decision")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown lane $name"))
      for (pass <- 0 to warms) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).collect().length
        val label = if (pass == 0) "cold" else s"warm$pass"
        println(f"[lanetime] $name $label ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
