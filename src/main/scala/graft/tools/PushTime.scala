package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Push-path profiler (r11 VERDICT task 7): drives PushJob.push against a
  * local mock endpoint and reports (a) clean-path rows/s — the number the
  * Bench `push_rows_per_sec` slice and its BASELINE.md bar are set from —
  * (b) throughput under a sustained non-2xx rate with an uncapped budget,
  * and (c) the failure-budget abort: how many requests a partition sends
  * before the 3-strike ApiError kills the task, i.e. the blast radius of a
  * down endpoint in requests, not wall-clock.
  *
  * The mock runs cpus-wide (HttpServer's default single dispatch thread
  * would serialize the pushing partitions and measure the mock, not the
  * engine) and drains request bodies so keep-alive reuse stays live.
  * Usage: runMain graft.tools.PushTime [rows] [reps]
  */
object PushTime {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000L
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    val cpus = spark.sparkContext.defaultParallelism
    println(f"[pushtime] anchor_s=${graft.core.Calibration.measure()}%.3f")

    val hits = new AtomicLong(0)
    val failEvery = new AtomicLong(0) // 0 = never fail; N = every Nth request 500s
    val es = java.util.concurrent.Executors.newFixedThreadPool(cpus)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/api", (ex: com.sun.net.httpserver.HttpExchange) => {
      val in = ex.getRequestBody
      val buf = new Array[Byte](8192)
      while (in.read(buf) != -1) {}
      val n = hits.incrementAndGet()
      val fe = failEvery.get()
      ex.sendResponseHeaders(if (fe > 0 && n % fe == 0) 500 else 200, -1)
      ex.close()
    })
    server.setExecutor(es)
    server.start()
    val url = s"http://localhost:${server.getAddress.getPort}/api"

    val docs = spark.range(rows).selectExpr(
        "concat('{\"id\": ', id, ', \"payload\": \"', repeat('x', 64), '\"}') AS doc")
      .repartition(cpus).persist()
    docs.count()

    try {
      // (a) clean path: warmup + reps, Bench-aligned barriers
      graft.push.PushJob.push(docs, "doc", url)
      val clean = (0 until reps).map { i =>
        System.gc(); spark.range(1000).count()
        val t0 = System.nanoTime()
        graft.push.PushJob.push(docs, "doc", url)
        val rps = rows / ((System.nanoTime() - t0) / 1e9)
        println(f"[pushtime] clean rep$i rows/s=$rps%.0f")
        rps
      }
      println(f"[pushtime] clean median=${clean.sorted.apply(reps / 2)}%.0f " +
        f"spread=${clean.max / clean.min}%.2f")

      // (b) sustained 10% failure, budget effectively uncapped: the
      // degraded-endpoint steady state — failures cost one response each,
      // never a task retry
      failEvery.set(10)
      val t1 = System.nanoTime()
      graft.push.PushJob.push(docs, "doc", url, maxFailures = Int.MaxValue)
      val degraded = rows / ((System.nanoTime() - t1) / 1e9)
      println(f"[pushtime] degraded(10%% 500s, uncapped budget) rows/s=$degraded%.0f")
      failEvery.set(0)

      // (c) budget abort: all-500 endpoint, default 3-strike budget. In
      // local mode a task failure fails the job (no task retries), so the
      // blast radius is bounded by (maxFailures+1) requests per partition —
      // count what actually went over the wire before the abort.
      failEvery.set(1)
      hits.set(0)
      val t2 = System.nanoTime()
      val failed =
        try { graft.push.PushJob.push(docs, "doc", url); false }
        catch { case _: Throwable => true }
      println(f"[pushtime] budget-abort: failed=$failed " +
        f"requests_before_abort=${hits.get()} (bound=${4 * cpus} = 4*cpus) " +
        f"wall=${(System.nanoTime() - t2) / 1e9}%.2fs")
      failEvery.set(0)
    } finally {
      server.stop(0)
      es.shutdownNow()
      spark.stop()
    }
  }
}
