package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query wall-clock timer for perf iteration (Bench times the whole
  * surface; this times one query, 3 reps, so rep0 ≈ cold and rep2 ≈ warm).
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.QTime <queryName>…
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    // r15 VERDICT task 8: count()-based timing lets Catalyst prune columns
    // (and sometimes whole subtrees) the count does not need — the
    // instrument class that hid the inherited q93 regression. The gated
    // metric lives in tools/NoopTime; this tool remains for quick loops.
    System.err.println("[qtime] WARNING: times count(), which PRUNES " +
      "columns — NOT the gated noop metric; use graft.tools.NoopTime for " +
      "any number that feeds an optimization decision")
    args.foreach { name =>
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[qtime] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
        // Same inter-measurement hygiene as Bench: lanes persist() shared
        // frames for intra-query reuse; without a blocking drop here a
        // later rep would read the previous rep's cache (CacheManager
        // matches the identical canonical plan) and "warm" would measure
        // only the post-cache tail instead of the query.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
      }
    }
    spark.stop()
  }
}
