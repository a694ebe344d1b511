package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only exchange-byte A/B for the q93 twin-collapse window key
  * (r12 VERDICT task 6): full sorted-array partition key (the r12 shape —
  * rows cross the exchange carrying sh AND its sorted copy) vs the r13
  * (n, xxhash64(sorted)) key with the in-group exact verify. Reports total
  * shuffle bytes/records written per variant over the SAME corpus — the
  * TriProbe meter pattern. Not benched/verified.
  */
object KeyDietProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

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
    // noop-write, not count(): count lets Catalyst PRUNE the unused window
    // — and with it the exchange under measurement (observed: 0 shuffle
    // records). The real lane consumes every column downstream.
    def meter(label: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      (0 until 2).foreach { i =>
        Thread.sleep(1000) // listener bus settle (async; dev tool)
        shufBytes.set(0L); shufRecs.set(0L)
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        Thread.sleep(1000)
        println(f"[keydiet] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs " +
          f"shuffleMB=${shufBytes.get / 1048576.0}%.2f recs=${shufRecs.get}")
      }

    val d = graft.queries.Similarity.docsWithShingles(spark, sfDir)
      .localCheckpoint(true) // shared input — meter only the collapse

    // r12 shape: full sorted array as partition key (payload-wide exchange)
    def arrayKey = d
      .select(col("doc_id"), size(col("sh")).as("n"), col("sh"),
        array_sort(col("sh")).as("key"))
      .withColumn("rep_id", min(col("doc_id")).over(Window.partitionBy(col("key"))))
      .drop("key")
    // r13 shape (the production q93 form): (n, 64-bit hash) key, in-group
    // exact verify, colliders resolved by the per-SET window — which must
    // REUSE the (n, kh) exchange (hashpartitioning(n, kh) satisfies the
    // finer clustered distribution), so measured bytes equal the byHash
    // exchange alone; a second exchange here would show up as ~2x bytes
    def hashKey = {
      val byHash = Window.partitionBy(col("n"), col("kh")).orderBy(col("doc_id"))
      val bySet = Window.partitionBy(col("n"), col("kh"), array_sort(col("sh")))
      d.select(col("doc_id"), size(col("sh")).as("n"), col("sh"))
        .withColumn("kh", xxhash64(array_sort(col("sh"))))
        .withColumn("rep_id0", first(col("doc_id")).over(byHash))
        .withColumn("rep_sh", first(col("sh")).over(byHash))
        .withColumn("rep_id",
          when(array_sort(col("sh")) === array_sort(col("rep_sh")),
            col("rep_id0"))
            .otherwise(min(col("doc_id")).over(bySet)))
        .select(col("doc_id"), col("n"), col("sh"), col("rep_id"))
    }
    meter("collapse_array_key")(arrayKey)
    meter("collapse_hash_key")(hashKey)
    // sanity: identical rep assignment on this corpus
    val a = arrayKey.select(col("doc_id"), col("rep_id"))
    val h = hashKey.select(col("doc_id"), col("rep_id"))
    val diff = a.exceptAll(h).count() + h.exceptAll(a).count()
    println(s"[keydiet] rep-assignment diff=$diff")
    spark.stop()
  }
}
