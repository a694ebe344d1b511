package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: print Catalyst's optimized-plan sizeInBytes estimate for the
  * basketPairs input frame (the 2-column lineitem projection) across corpus
  * dirs — calibrates the hot-key derivation gate threshold in
  * Similarity.splitHotBuckets (r14 VERDICT task 3). Not benched/verified. */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq else Seq(
      "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
      "/tmp/graft_scale1", "/tmp/graft_scale32", "/tmp/graft_scale32_f32",
      "/tmp/graft_scale128")
    dirs.foreach { d =>
      if (new java.io.File(s"$d/lineitem.parquet").exists) {
        val raw = spark.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val frame = raw.select(col("ok").as("__bk"), col("pk").cast("long").as("e"))
        val est = frame.queryExecution.optimizedPlan.stats.sizeInBytes
        println(f"[stats] $d sizeInBytes=$est (${est.toDouble / (1 << 20)}%.1f MiB)")
      } else println(s"[stats] $d missing")
    }
    spark.stop()
  }
}
