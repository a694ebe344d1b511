package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only rehearsal for q49_dq at widened relational scale — the round-8
  * rehearsal that aborted because the widened dir lacked lineitem/orders.
  * Self-unions sf0.1 lineitem + orders `SPARK_GRAFT_SCALE_COPIES`×
  * (orderkey remapped consistently on BOTH tables so FK integrity is
  * preserved across copies) and symlinks events/documents from the source
  * sf, then times the full constraint gate twice (cold/warm). The
  * expected verdicts are scale-invariant by construction: uniqueness
  * violations and FK orphans multiply exactly by `copies`. */
object DqScale {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "32").toInt
    val out = s"/tmp/graft_dq$copies"
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$out/lineitem.parquet/_SUCCESS").exists()) {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      (0 until copies).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
      (0 until copies).map(i =>
          o.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
      for (t <- Seq("events", "documents")) {
        val p = java.nio.file.Paths.get(s"$out/$t.parquet")
        if (!java.nio.file.Files.exists(p))
          java.nio.file.Files.createSymbolicLink(p,
            java.nio.file.Paths.get(s"$sf/$t.parquet"))
      }
    }
    println(s"[dq$copies] lineitem rows: " +
      spark.read.parquet(s"$out/lineitem.parquet").count())
    for (pass <- Seq("cold", "warm")) {
      val t0 = System.nanoTime()
      val rows = graft.queries.Entity.q49Dq(spark, out).collect()
      println(f"[dq$copies] $pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (pass == "warm") rows.foreach(r => println(s"[dq$copies]   $r"))
    }
    // the documented 10^12-row posture, applied by the optimizer rule
    // instead of a lane edit: exact COUNT(DISTINCT) -> HLL++ via one conf
    spark.conf.set("spark.graft.approxDistinct", "true")
    for (pass <- Seq("approx-cold", "approx-warm")) {
      val t0 = System.nanoTime()
      val rows = graft.queries.Entity.q49Dq(spark, out).collect()
      println(f"[dq$copies] $pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (pass == "approx-warm") rows.foreach(r => println(s"[dq$copies]   $r"))
    }
    spark.conf.set("spark.graft.approxDistinct", "false")
    spark.stop()
  }
}
