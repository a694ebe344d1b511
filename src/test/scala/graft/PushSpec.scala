package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.push.PushJob
import org.apache.spark.SparkException

/** t1 smoke for the reverse-ETL push (Q31/R10-R11) against a local mock
  * HTTP endpoint — the Spark-native analogue of the reference's
  * requests_mock.py doubles. */
class PushSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(handler: HttpExchange => Int)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/api", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val code = handler(ex)
        ex.sendResponseHeaders(code, -1)
        ex.close()
      }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}/api")
    finally server.stop(0)
  }

  test("Q31: every row is POSTed once; 2xx counted as success") {
    val seen = new AtomicInteger(0)
    withServer { ex => seen.incrementAndGet(); 201 } { url =>
      val df = (1 to 20).map(i => s"""{"id": $i}""").toDF("doc")
      PushJob.push(df.repartition(2), "doc", url)
      assert(seen.get() === 20)
    }
  }

  test("Q31: failure budget — >3 non-2xx responses abort the job") {
    withServer { _ => 500 } { url =>
      val df = (1 to 10).map(i => s"""{"id": $i}""").toDF("doc")
      val e = intercept[SparkException] {
        PushJob.push(df.coalesce(1), "doc", url)
      }
      assert(e.getCause.isInstanceOf[PushJob.ApiError] ||
        e.getMessage.contains("aborting partition"))
    }
  }

  test("push sends the configured method and Authorization: ApiKey header " +
    "(CommCareAPIHandler.py:300,321)") {
    val methods = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val auths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer { ex =>
      methods.add(ex.getRequestMethod)
      auths.add(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      200
    } { url =>
      val df = (1 to 5).map(i => s"""{"id": $i}""").toDF("doc")
      PushJob.push(df.coalesce(1), "doc", url, method = "PUT",
        authToken = Some("svc:key123"))
      assert(methods.size === 5)
      assert(methods.toArray.forall(_ == "PUT"))
      assert(auths.toArray.forall(_ == "ApiKey svc:key123"))
    }
  }

  test("case-type push logs each record's form_id (CommCareAPIHandler.py:303-304)") {
    withServer { _ => 200 } { url =>
      val df = Seq(
        """{"id": 1, "form_id": "f-aaa"}""",
        """{"id": 2, "form_id": "f-bbb"}""").toDF("doc")
      // capture executor-thread stderr (local mode: same JVM, so the global
      // stream swap sees the foreachPartition logging)
      val buf = new java.io.ByteArrayOutputStream()
      val prev = System.err
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      try PushJob.push(df.coalesce(1), "doc", url, logIdField = Some("form_id"))
      finally System.setErr(prev)
      val logged = buf.toString("UTF-8")
      assert(logged.contains("[push] form_id=f-aaa"))
      assert(logged.contains("[push] form_id=f-bbb"))
    }
  }

  test("Q31: up to 3 failures are tolerated (reference APIErrorMax)") {
    val calls = new AtomicInteger(0)
    withServer { _ => if (calls.incrementAndGet() <= 3) 500 else 200 } { url =>
      val df = (1 to 10).map(i => s"""{"id": $i}""").toDF("doc")
      PushJob.push(df.coalesce(1), "doc", url) // 3 failures, then successes: no abort
      assert(calls.get() === 10)
    }
  }
}
