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
