package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only ingest-phase profiler: attributes Bench's ingest-rep spread
  * (107–211 k rows/s across reps in BENCH_r4) by timing, per rep, the
  * compute+shuffle prefix alone (same normalization, same repartition,
  * `noop` sink — no files) against the full writeBronze (parquet encode +
  * task/job commit + dynamic partition dirs). The difference isolates the
  * file-materialization side, which is where /tmp filesystem jitter would
  * land. Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.IngestTime [reps]
  */
object IngestTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 6
    val spark = graft.GraftSession.builder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.maxConcurrentOutputFileWriters", "64") // Bench parity
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outRoot = java.nio.file.Files.createTempDirectory("graft_ingest_time").toString
    val ev = graft.core.Tables.events(spark, sfDir)
    val n = ev.count()
    val width = graft.core.ApiLimitCalculator.writeWidth(
      n, spark.sparkContext.defaultParallelism)
    // warm both paths once at FULL size (codegen + writer-class init + the
    // real task/commit shape — a 1000-row warmup leaves the full-width
    // commit path cold, visible as slow first reps)
    graft.ingest.Ingest.writeBronze(ev, s"$outRoot/warm", tsCol = "ts",
      granularity = "day", writeTasks = Some(width))
    val perRepWrites = sys.env.getOrElse("SPARK_GRAFT_INGEST_WRITES", "1").toInt
    (0 until reps).foreach { rep =>
      System.gc()
      // Phase A: normalize + day-partition columns + width repartition,
      // terminated by a noop sink — everything writeBronze does BEFORE
      // the parquet writer sees a row.
      val t0 = System.nanoTime()
      ev.withColumn("year", year(col("ts")))
        .withColumn("month", month(col("ts")))
        .withColumn("day", dayofmonth(col("ts")))
        .repartition(width, col("year"), col("month"), col("day"))
        .write.mode("overwrite").format("noop").save()
      val tNoop = (System.nanoTime() - t0) / 1e9
      // Phase A+B: the real thing — parquet encode, per-task commit,
      // dynamic partition dirs, driver job commit. perRepWrites > 1 widens
      // the timed region over several consecutive writes so sub-second
      // fixed-cost jitter (job submit, commit renames, GC pauses) amortizes.
      val t1 = System.nanoTime()
      (0 until perRepWrites).foreach { w =>
        graft.ingest.Ingest.writeBronze(ev, s"$outRoot/b${rep}_$w", tsCol = "ts",
          granularity = "day", writeTasks = Some(width))
      }
      val tFull = (System.nanoTime() - t1) / 1e9
      println(f"[ingesttime] rep$rep noop=$tNoop%.2fs full=$tFull%.2fs " +
        f"write_side=${tFull - tNoop * perRepWrites}%.2fs " +
        f"rows_per_s=${n.toDouble * perRepWrites / tFull}%.0f")
      // delete outside the timed region, like Bench
      try {
        import scala.jdk.CollectionConverters._
        (0 until perRepWrites).foreach { w =>
          java.nio.file.Files.walk(java.nio.file.Paths.get(s"$outRoot/b${rep}_$w"))
            .sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(java.nio.file.Files.delete)
        }
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
