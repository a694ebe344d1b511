package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase profiler for the q25_ivf_scale lane: times each stage of
  * the pipeline in isolation (post-warm) to locate the dominant cost.
  * Not part of the bench/verify contract. */
object IvfProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    graft.functions.GraftFunctions.register(spark)

    val jobsSeen = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobsSeen.incrementAndGet()
    })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobsSeen.get
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[ivfprof] $label: $dt%.3fs jobs=${jobsSeen.get - j0}")
      r
    }
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    (0 until 2).foreach { rep =>
      println(s"[ivfprof] === rep $rep ===")
      val e = graft.core.Tables.embeddings(spark, sfDir)
      val n = time("count")(e.count())
      val k = graft.queries.Similarity.kForCorpus(n)
      val seeds = time("seeds_collect")(
        e.withColumn("ch", expr(graft.queries.TextOps.h60("CAST(vec_id AS STRING)")))
          .orderBy(col("ch"), col("vec_id")).limit(k)
          .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
          .collect()).map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
      println(s"[ivfprof] n=$n k=$k dims=${seeds.head._2.length}")
      val cents = time("means_collect")(
        graft.queries.Similarity.ivfMeansFromSeeds(e, seeds).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq)
      time("exact_topk_collect")(
        graft.queries.Similarity.q25CosineTopk(spark, sfDir)
          .select(col("vec_id")).collect().length)
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
      spark.sparkContext.addSparkListener(listener)
      time("full_lane")(graft.SparkEntry.queries("q25_ivf_scale")(spark, sfDir).count())
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(s"[ivfprof] full_lane jobs=${jobs.get} stages=${stages.get} taskTimeMs=${taskMs.get}")
      hygiene()
    }
    spark.stop()
  }
}
