package graft.tools

import org.apache.spark.sql.streaming.Trigger

/** Dev-only streaming scale rehearsal (r11 verdict task 4): drives the
  * stateful stream shapes — tumbling (the Bench slice), sliding + session
  * (Q28), and flatMapGroupsWithState bursts (Q42's arbitrary-state family)
  * — against a ScaleSmoke-widened corpus on the ROCKSDB state store
  * provider, AvailableNow, noop sink. Prints per-shape wall, rows/s, and
  * the state-store behavior the batch sweep can't see: state rows total,
  * commit time, and RocksDB's own memory/SST metrics (which also prove the
  * provider was genuinely active, the RocksDbStateSpec discipline).
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_scale32 runMain graft.tools.StreamScale [shapes…]
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"[streamscale] anchor_s=${graft.core.Calibration.measure()}%.3f dir=$sfDir")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val nRows = spark.read.parquet(s"$sfDir/events.parquet").count()
    // same input-scaled state width as the Bench stream slice
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.core.ApiLimitCalculator.streamStateWidth(
        nRows, spark.sparkContext.defaultParallelism.toLong).toString)
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema

    // GRAFT_STREAM_REMAP=1: scale state KEY CARDINALITY, not just volume.
    // ScaleSmoke's widened events keep the original user_ids/timestamps
    // (only event_id is offset per copy at i*1e8), so user- and
    // window-keyed state stays 1×-sized at any copy factor — the copies
    // multiply rows per key. The copy index is recoverable row-locally
    // from the event_id offset; remapping user_id into a per-copy universe
    // makes the stateful shapes carry copies× state rows — the dimension
    // that actually stresses the store.
    val remap = sys.env.get("GRAFT_STREAM_REMAP").contains("1")
    def src() = {
      val evPath = s"$sfDir/events.parquet"
      val reader = spark.readStream.schema(rawSchema)
      val base = graft.core.Tables.normalizeEventTs(
        if (new java.io.File(evPath).isDirectory) reader.parquet(evPath)
        else reader.option("pathGlobFilter", "events.parquet").parquet(sfDir))
      if (remap) base.withColumn("user_id",
        org.apache.spark.sql.functions.expr(
          "user_id + (event_id div 100000000) * 100000"))
      else base
    }
    if (remap) println("[streamscale] remap=1 (per-copy user universes)")

    val shapes: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "tumbling" -> graft.streaming.StreamingJobs.tumblingCounts _,
      "sliding" -> graft.streaming.StreamingJobs.slidingCounts _,
      "session" -> graft.streaming.StreamingJobs.sessionCounts _,
      "bursts_fmgws" -> graft.streaming.StreamingJobs.userBurstCounts _)
    val wanted = if (args.nonEmpty) args.toSet else shapes.map(_._1).toSet

    shapes.filter(s => wanted(s._1)).foreach { case (name, job) =>
      (0 until 2).foreach { rep =>
        System.gc()
        spark.range(1000).count() // settle barrier (the Bench.streamPass discipline)
        val ckpt = java.nio.file.Files.createTempDirectory("graft_streamscale").toString
        val t0 = System.nanoTime()
        val q = job(src())
          .writeStream.format("noop").option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val sos = q.recentProgress.flatMap(_.stateOperators.toSeq)
        val stateRows = if (sos.isEmpty) 0L else sos.map(_.numRowsTotal).max
        val commitMs = sos.map(_.commitTimeMs).sum
        import scala.jdk.CollectionConverters._
        val rocksMem = sos.flatMap(_.customMetrics.asScala)
          .filter(_._1 == "rocksdbTotalMemoryUsageBytes").map(_._2.toLong)
        val sst = sos.flatMap(_.customMetrics.asScala)
          .filter(_._1 == "rocksdbSstFileSize").map(_._2.toLong)
        println(f"[streamscale] $name rep$rep wall=$wall%.2fs " +
          f"rows_per_s=${nRows / wall}%.0f batches=${q.recentProgress.length} " +
          f"state_rows=$stateRows commit_ms=$commitMs " +
          f"rocks_mem_mb=${if (rocksMem.isEmpty) 0.0 else rocksMem.max / 1048576.0}%.1f " +
          f"sst_mb=${if (sst.isEmpty) 0.0 else sst.max / 1048576.0}%.1f " +
          s"rocksdb_active=${sos.exists(_.customMetrics.asScala.keys.exists(_.toLowerCase.contains("rocksdb")))}")
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { p.toFile.delete(); () })
        finally walk.close()
      }
    }
    spark.stop()
  }
}
