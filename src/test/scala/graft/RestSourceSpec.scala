package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

/** t1 e2e for the graft-rest DataSource V2 (R1–R4, R11): a mock paginated
  * envelope API served over a real socket, read through
  * spark.read.format("graft-rest"). */
class RestSourceSpec extends SparkSpec {
  import spark.implicits._

  /** Mock CommCare-ish API: 25 rows, 2024-01-01T00:00:00 + i minutes,
    * keyset pagination via indexed_on_start (>=), honoring
    * indexed_on_end (<) — mirrors Testing/requests_mock.py but with real
    * HTTP + real pagination. */
  private def row(i: Int): String = {
    val ts = f"2024-01-01T00:$i%02d:00.000000Z"
    s"""{"id": $i, "indexed_on": "$ts", "k": ${i * 10}}"""
  }
  private val N = 25

  private def serve(requests: AtomicInteger)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/api", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        val limit = params.getOrElse("limit", "1000").toInt
        val start = params.get("indexed_on_start")
          .map(graft.sources.RestEnvelopeSource.parseTsMicros)
        val end = params.get("indexed_on_end")
          .map(graft.sources.RestEnvelopeSource.parseTsMicros)
        def tsOf(i: Int): Long =
          graft.sources.RestEnvelopeSource.parseTsMicros(f"2024-01-01T00:$i%02d:00.000000Z")
        val matching = (0 until N)
          .filter(i => start.forall(tsOf(i) >= _) && end.forall(tsOf(i) < _))
        val page = matching.take(limit)
        val body =
          s"""{"meta": {"limit": $limit, "next": null, "total_count": ${matching.size}},
             | "objects": [${page.map(row).mkString(",")}]}""".stripMargin
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}/api")
    finally server.stop(0)
  }

  test("R1/R2: keyset pagination pulls every row exactly once after dedup") {
    val reqs = new AtomicInteger(0)
    serve(reqs) { url =>
      val df = spark.read.format("graft-rest")
        .option("url", url).option("limit", "10").load()
      // >=-restart duplicates boundary rows by design (R2) — dedup is the
      // documented downstream contract (Q5/Q6)
      val ids = df.dropDuplicates(Seq("id")).select($"id").as[Long].collect().sorted
      assert(ids.toSeq === (0L until N.toLong))
      assert(reqs.get() >= 3) // 25 rows / page 10 ⇒ ≥3 pages
    }
  }

  test("R4: indexed_on range filter is pushed into API params and honored") {
    val reqs = new AtomicInteger(0)
    serve(reqs) { url =>
      val df = spark.read.format("graft-rest")
        .option("url", url).option("limit", "100").load()
        .filter($"indexed_on" >= lit("2024-01-01 00:05:00").cast("timestamp") &&
          $"indexed_on" < lit("2024-01-01 00:10:00").cast("timestamp"))
      val ids = df.dropDuplicates(Seq("id")).select($"id").as[Long].collect().sorted
      assert(ids.toSeq === (5L to 9L))
      // pushdown visible in the plan (R4): the scan description carries the window
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft-rest"))
    }
  }

  test("time-range slicing plans one partition per slice (distributed pull)") {
    val reqs = new AtomicInteger(0)
    serve(reqs) { url =>
      val df = spark.read.format("graft-rest")
        .option("url", url).option("limit", "100").option("slices", "4").load()
        .filter($"indexed_on" >= lit("2024-01-01 00:00:00").cast("timestamp") &&
          $"indexed_on" < lit("2024-01-01 00:20:00").cast("timestamp"))
      assert(df.rdd.getNumPartitions === 4)
      val ids = df.dropDuplicates(Seq("id")).select($"id").as[Long].collect().sorted
      assert(ids.toSeq === (0L to 19L))
    }
  }

  test("R11: request budget aborts a runaway pagination") {
    val reqs = new AtomicInteger(0)
    serve(reqs) { url =>
      val e = intercept[Exception] {
        // limit 2 + >=-restart advances ~1 row/page ⇒ ~25 pages > budget 5.
        // (limit 1 would instead trip the stuck-keyset guard: a 1-row page
        // re-fetches its own boundary row forever.)
        spark.read.format("graft-rest")
          .option("url", url).option("limit", "2")
          .option("max_requests", "5").load().count()
      }
      assert(e.getMessage.contains("request budget") ||
        e.getCause != null && e.getCause.getMessage.contains("request budget"))
    }
  }

  test("payload column carries the full object JSON for schema-on-read") {
    serve(new AtomicInteger(0)) { url =>
      val df = spark.read.format("graft-rest")
        .option("url", url).option("limit", "100").load()
        .dropDuplicates(Seq("id"))
      val k = df.select(get_json_object($"payload", "$.k").cast("long").as("k"))
        .agg(sum($"k")).as[Long].head
      assert(k === (0 until N).map(_ * 10).sum)
    }
  }
}
