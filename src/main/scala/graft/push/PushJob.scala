package graft.push

import org.apache.spark.sql.DataFrame
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

/** Reverse-ETL push path (SURVEY.md §2A R9–R11; `CommCareAPIHandler.py:
  * 279-326`): read landed JSON, POST/PATCH each document to an HTTP
  * endpoint with a per-table method, tolerating up to `maxFailures`
  * failed requests per partition before aborting (the reference's 3-strike
  * `APIErrorMax`, `:23-24,44-55`).
  *
  * Spark-native shape: `foreachPartition` — one connection-ish context per
  * partition, rows streamed through it; no driver collect. Task retries
  * (spark.task.maxFailures) give at-least-once delivery, matching the
  * reference's Lambda-retry semantics; receivers must be idempotent (same
  * as the reference's API).
  */
object PushJob {
  final case class PushStats(sent: Long, failed: Long)

  class ApiError(msg: String) extends RuntimeException(msg)

  /** POST one JSON document; returns true on 2xx
    * (`util.py:13-27` process_response). */
  private[push] def send(endpoint: String, method: String, body: String): Boolean = {
    val conn = new URL(endpoint).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val out = conn.getOutputStream
      out.write(body.getBytes(StandardCharsets.UTF_8))
      out.close()
      val code = conn.getResponseCode
      code >= 200 && code < 300
    } finally conn.disconnect()
  }

  /** Push every row's `jsonCol` to `endpoint`. Per-partition failure budget:
    * more than `maxFailures` non-2xx responses ⇒ ApiError fails the task
    * (Spark retries it; at-least-once). */
  def push(df: DataFrame, jsonCol: String, endpoint: String,
           method: String = "POST", maxFailures: Int = 3): Unit = {
    val rows = df.select(jsonCol)
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      var failures = 0
      it.foreach { row =>
        val ok =
          try send(endpoint, method, row.getString(0))
          catch { case _: java.io.IOException => false }
        if (!ok) {
          failures += 1
          if (failures > maxFailures)
            throw new ApiError(s"aborting partition after $failures failed requests")
        }
      }
    }
  }
}
