package graft.tools

import org.apache.spark.sql.functions._

/** Streaming-pass profiler: drives the Bench stream slice standalone and
  * dumps per-micro-batch progress (durationMs phases, state store metrics)
  * so the batch-vs-stream throughput gap is attributable, not guessed.
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.StreamTime [reps]
  */
object StreamTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    // clock anchor so stream bands from different containers normalize
    println(f"[streamtime] anchor_s=${graft.core.Calibration.measure()}%.3f")
    val nRows = spark.read.parquet(s"$sfDir/events.parquet").count()
    // Default to the SAME input-scaled state width Bench uses (one shared
    // definition) — this tool exists to attribute Bench's stream number,
    // so it must reproduce Bench's configuration unless overridden.
    val benchWidth = graft.core.ApiLimitCalculator.streamStateWidth(
      nRows, spark.sparkContext.defaultParallelism.toLong).toString
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("GRAFT_STREAM_PARTS", benchWidth))
    val walls = (0 until reps).map { rep =>
      // same per-pass barrier as Bench.streamPass (r10 item-1 discipline):
      // GC + a settle action drain the async cleaner OUTSIDE the timed region
      System.gc()
      spark.range(1000).count()
      val ckpt = java.nio.file.Files.createTempDirectory("graft_streamtime").toString
      val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
      // testdata ships events as one FILE next to the other tables (glob
      // the parent); ScaleSmoke's widened corpora ship it as a parquet
      // DIRECTORY (stream the directory itself)
      val evPath = s"$sfDir/events.parquet"
      val reader = spark.readStream.schema(rawSchema)
      val src = graft.core.Tables.normalizeEventTs(
        if (new java.io.File(evPath).isDirectory) reader.parquet(evPath)
        else reader.option("pathGlobFilter", "events.parquet").parquet(sfDir))
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingJobs.tumblingCounts(src)
        .writeStream.format("noop").option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streamtime] rep$rep wall=$wall%.2fs rows/s=${nRows / wall}%.0f")
      q.recentProgress.foreach { p =>
        println(s"[streamtime] rep$rep batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} state=${p.stateOperators.toSeq.map(s =>
            Map("commitTimeMs" -> s.commitTimeMs, "rowsUpdated" -> s.numRowsUpdated,
                "rowsTotal" -> s.numRowsTotal))}")
      }
      // close the walk stream — it holds a directory fd until closed
      // (VersionStore.deleteRecursively is the repo convention)
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { p.toFile.delete(); () }) // outside the next timed region
      finally walk.close()
      nRows / wall
    }
    // Band summary, Bench-aligned: rep0 = cold, warm = median of the rest,
    // TEMPORAL rep array (never sorted in place), max/min spread — the
    // numbers the BASELINE.md stream bar is set from.
    if (reps >= 2) {
      val warm = walls.drop(1)
      val med = warm.sorted.apply(warm.size / 2)
      println(f"[streamtime] summary cold=${walls.head}%.0f warm_median=$med%.0f " +
        f"spread=${warm.max / warm.min}%.2f reps=${warm.map(w => f"$w%.0f").mkString(",")}")
    }
    spark.stop()
  }
}
