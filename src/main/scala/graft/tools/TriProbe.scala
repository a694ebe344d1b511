package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage breakdown of the q62 triangle lane. Not benched/verified. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.core.Tables

    def time(label: String)(f: => Long): Unit =
      (0 until 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[tri] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      }

    def edges = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("pks"))
      .select(explode(expr(
        "pair_expand_ids(transform(pks, p -> struct(CAST(p AS BIGINT))))")).as("e"))
      .select(col("e.doc_a").as("a"), col("e.doc_b").as("b"))
      .distinct()

    // "meter" arg: skip straight to the closing-join byte meter + full lane
    // (the 64x A/B evidence run; the per-stage timings are 1x diagnostics)
    val meterOnly = args.contains("meter")
    if (!meterOnly) time("edges")(edges.count())

    def deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    if (!meterOnly) time("deg")(deg.count())

    def rank = deg.select(col("node"), struct(col("deg"), col("node")).as("rk"))
    def oriented = edges
      .join(rank.select(col("node").as("a"), col("rk").as("rka")), Seq("a"))
      .join(rank.select(col("node").as("b"), col("rk").as("rkb")), Seq("b"))
      .select(
        when(col("rka") < col("rkb"), col("a")).otherwise(col("b")).as("u"),
        when(col("rka") < col("rkb"), col("b")).otherwise(col("a")).as("v"))
    if (!meterOnly) time("oriented")(oriented.count())

    def adj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    if (!meterOnly) time("adj")(adj.count())

    def closed = oriented.select(col("u"), col("v"))
      .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(col("u"), col("v"),
        array_intersect(col("nu"), col("nv")).as("ws"))
      .filter(size(col("ws")) > 0)
    if (!meterOnly) time("closed")(closed.count())

    // Closing-join SHUFFLE-BYTE METER (r11 verdict task 5 evidence): the
    // same exploded one-join closing stage, array<long> payload vs the
    // pack_sorted_longs delta-varint binary, over one checkpointed adj —
    // total shuffle bytes/records WRITTEN (post-compression, the ENOSPC
    // currency) accumulated from stage metrics per variant. Broadcast is
    // suppressed (threshold -1) so the exchange under measurement is the
    // genuine shuffle-join path the 64×/128× rehearsals run.
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    val shufRecs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shufBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          shufRecs.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
          ()
        }
      })
    val adjP = adj
      .withColumn("np", expr("pack_sorted_longs(nbrs)"))
      .localCheckpoint(true)
    def meter(label: String)(f: => Long): Unit =
      (0 until 2).foreach { i =>
        Thread.sleep(1000) // listener bus settle (it's async; dev tool)
        shufBytes.set(0L); shufRecs.set(0L)
        val t0 = System.nanoTime()
        val n = f
        Thread.sleep(1000)
        println(f"[tri] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs " +
          f"rows=$n shuffleMB=${shufBytes.get / 1048576.0}%.1f recs=${shufRecs.get}")
      }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def closeArr = adjP
      .select(col("u"), col("nbrs").as("nu"), explode(col("nbrs")).as("v"))
      .join(adjP.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(col("u"), col("v"), array_intersect(col("nu"), col("nv")).as("ws"))
      .filter(size(col("ws")) > 0)
    def closePacked = adjP
      .select(col("u"), col("np").as("nu"), explode(col("nbrs")).as("v"))
      .join(adjP.select(col("u").as("v"), col("np").as("nv")), Seq("v"))
      .select(col("u"), col("v"), expr("intersect_packed(nu, nv)").as("ws"))
      .filter(size(col("ws")) > 0)
    meter("close_array_bytes")(closeArr.count())
    meter("close_packed_bytes")(closePacked.count())
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    time("full")(graft.queries.Entity.q62Triangles(spark, sfDir).count())
    spark.stop()
  }
}
