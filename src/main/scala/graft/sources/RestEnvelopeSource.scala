package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source for paginated REST "envelope" APIs — the
  * Spark-native form of the reference's pull engine (SURVEY §2A R1–R4;
  * `CommCareAPIHandler.py:207-262`):
  *
  *  - R1 paginated scan: repeated GETs until the envelope's `meta.next` is
  *    empty (`:241-244`), or keyset advance when `uses_indexed_on`.
  *  - R2 keyset pagination: `order_by=indexed_on`, next page restarts at
  *    the last row's `indexed_on` with `>=` — boundary rows duplicate BY
  *    DESIGN (`:239`); downstream dedup (Q5/Q6) is the contract.
  *  - R3 opaque cursor: follow `meta.next` verbatim.
  *  - R4 predicate pushdown: `indexed_on` range filters become
  *    `indexed_on_start/end` query params (SupportsPushDownFilters) —
  *    the same params the reference builds in `_get_indexing_params`
  *    (`:180-200`). Pushed filters are also re-evaluated by Spark (residual)
  *    so `>=`-restart duplicates never widen the window.
  *  - R11 request budget: `max_requests` aborts the read past the cap
  *    (`:217-224`).
  *
  * Scale design the reference cannot express: when a pushed (or configured)
  * time range is present, the range splits into `slices` InputPartitions —
  * each executor pulls its own sub-window concurrently, turning the
  * sequential Lambda page loop into distributed extraction. Rows come out
  * as a stable typed core (`id`, `indexed_on`) plus the raw object JSON
  * (`payload`) for schema-on-read promotion via from_json (SURVEY §1.4).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-rest")
  *     .option("url", "http://host/api/v0.5/case")
  *     .option("limit", "1000")           // page size
  *     .option("uses_indexed_on", "true") // keyset vs opaque cursor
  *     .option("slices", "8")             // partitions per pushed range
  *     .load()
  *     .filter($"indexed_on" >= start && $"indexed_on" < end)
  * }}}
  */
class RestEnvelopeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestEnvelopeSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RestEnvelopeTable(properties)
}

object RestEnvelopeSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("indexed_on", TimestampType),
    StructField("payload", StringType)))

  /** Per-table API param special cases (`CommCareAPIHandler.py:180-200`):
    * `form` adds `include_archived=true` to every page request;
    * `action_times` keys its window on `UTC_start_time_start/end` instead of
    * `indexed_on_start/end` and sends NO `order_by`. Returned maps are
    * reader options — pass them through `.options(...)` (or
    * `Ingest.restPullRun(tableOptions = ...)`). The output column is still
    * named `indexed_on` (the typed index-timestamp core); only the wire
    * params and the payload field the keyset restart reads change. */
  def tableOptions(table: String): Map[String, String] = table match {
    case "form"         => Map("extra_params" -> "include_archived=true")
    case "action_times" => Map("index_field" -> "UTC_start_time", "order_by" -> "")
    case _              => Map.empty
  }

  /** Dual-format micros parse (`CommCareAPIHandler.py:235-238`). */
  def parseTsMicros(s: String): Long = {
    val trimmed = if (s.endsWith("Z")) s.dropRight(1) else s
    val ldt = java.time.LocalDateTime.parse(trimmed)
    ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
      ldt.getNano / 1000L
  }

  def fmtTs(micros: Long): String =
    java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(micros / 1000000L, (micros % 1000000L) * 1000L),
      java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
}

class RestEnvelopeTable(properties: util.Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = s"graft-rest(${properties.get("url")})"
  override def schema(): StructType = RestEnvelopeSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(options)
}

class RestScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownFilters {
  private var lower: Option[Long] = None // micros, inclusive
  private var upper: Option[Long] = None // micros, exclusive-ish (API end param)
  private var pushed: Array[Filter] = Array.empty

  /** R4: translate indexed_on range filters into API window params. All
    * filters stay residual (Spark re-applies them) — correctness never
    * depends on server-side filtering or on `>=`-restart page boundaries. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val p = ArrayBuffer[Filter]()
    filters.foreach {
      case f @ GreaterThanOrEqual("indexed_on", v: java.sql.Timestamp) =>
        lower = Some(tsMicros(v)); p += f
      case f @ GreaterThan("indexed_on", v: java.sql.Timestamp) =>
        lower = Some(tsMicros(v)); p += f
      case f @ LessThan("indexed_on", v: java.sql.Timestamp) =>
        upper = Some(tsMicros(v)); p += f
      case f @ LessThanOrEqual("indexed_on", v: java.sql.Timestamp) =>
        // the API's indexed_on_end is EXCLUSIVE ([start,end) window,
        // CommCareAPIHandler.py:180-200): push one microsecond past so the
        // pushed window stays a SUPERSET of the predicate; the residual
        // filter trims the overfetch
        upper = Some(tsMicros(v) + 1); p += f
      case _ =>
    }
    pushed = p.toArray
    filters // everything residual
  }
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new RestScan(options, lower, upper)
}

class RestScan(options: CaseInsensitiveStringMap,
               lower: Option[Long], upper: Option[Long]) extends Scan with Batch {
  override def readSchema(): StructType = RestEnvelopeSource.SCHEMA
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rest url=${options.get("url")} window=[$lower,$upper)"

  /** One partition per time slice when a window is known (distributed
    * extraction); otherwise a single sequential cursor walk (R3). */
  override def planInputPartitions(): Array[InputPartition] = {
    val slices = math.max(1, options.getInt("slices", 1))
    (lower, upper) match {
      case (Some(lo), Some(hi)) if slices > 1 && hi > lo =>
        val step = math.max(1L, (hi - lo) / slices)
        (0 until slices).map { i =>
          val s = lo + i * step
          val e = if (i == slices - 1) hi else math.min(hi, s + step)
          RestInputPartition(Some(s), Some(e)): InputPartition
        }.toArray
      case _ =>
        Array(RestInputPartition(lower, upper))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val indexField =
      Option(options.get("index_field")).filter(_.nonEmpty).getOrElse("indexed_on")
    // order_by: absent → order by the index field (the reference's default);
    // explicitly empty → omit entirely (the `action_times` shape,
    // CommCareAPIHandler.py:193-199)
    val orderBy = Option(options.get("order_by")) match {
      case None     => Some(indexField)
      case Some("") => None
      case Some(o)  => Some(o)
    }
    // cross-table budget: resolved DRIVER-side (this method runs on the
    // driver) so the accumulator rides the serialized factory into every
    // partition reader task
    // lookup, NOT acquire: only the run owner (cli.runPull) registers the
    // counter. A scan whose key has already been released (e.g. a plan
    // re-executed after the run ended) must not re-register an accumulator
    // nobody will ever read or release — that entry would be pinned in the
    // registry forever.
    val budget = Option(options.get("budget_key")).filter(_.nonEmpty)
      .flatMap(RequestBudget.lookup)
    new RestReaderFactory(
      options.get("url"),
      options.getInt("limit", 1000),
      options.getBoolean("uses_indexed_on", true),
      options.getInt("max_requests", 1000),
      Option(options.get("auth_token")).filter(_.nonEmpty),
      indexField,
      orderBy,
      Option(options.get("extra_params")).filter(_.nonEmpty),
      budget)
  }
}

case class RestInputPartition(startMicros: Option[Long], endMicros: Option[Long])
  extends InputPartition

class RestReaderFactory(url: String, limit: Int, usesIndexedOn: Boolean,
                        maxRequests: Int, authToken: Option[String] = None,
                        indexField: String = "indexed_on",
                        orderBy: Option[String] = Some("indexed_on"),
                        extraParams: Option[String] = None,
                        budget: Option[org.apache.spark.util.LongAccumulator] = None)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestInputPartition]
    new RestPartitionReader(url, limit, usesIndexedOn, maxRequests,
      p.startMicros, p.endMicros, authToken, indexField, orderBy, extraParams,
      budget)
  }
}

/** Walks one page stream; executor-side, no driver involvement. */
class RestPartitionReader(url: String, limit: Int, usesIndexedOn: Boolean,
                          maxRequests: Int, startMicros: Option[Long],
                          endMicros: Option[Long],
                          authToken: Option[String] = None,
                          indexField: String = "indexed_on",
                          orderBy: Option[String] = Some("indexed_on"),
                          extraParams: Option[String] = None,
                          budget: Option[org.apache.spark.util.LongAccumulator] = None)
  extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private var buffer: Iterator[JsonNode] = Iterator.empty
  private var nextUrl: Option[String] = Some(buildUrl(startMicros))
  private var requests = 0
  // start micros of the page currently in flight — progress detector for the
  // keyset restart (a restart equal to the page's own start can never advance)
  private var pageStart: Option[Long] = startMicros
  private var current: InternalRow = _

  private def buildUrl(start: Option[Long]): String = {
    val sep = if (url.contains("?")) "&" else "?"
    val base = s"$url${sep}limit=$limit"
    // table-shape extras ride every page request (`form`'s
    // include_archived=true, CommCareAPIHandler.py:186-188)
    val extra = extraParams.map(p => s"&$p").getOrElse("")
    if (usesIndexedOn) {
      // R2/R4: order_by + window params, exactly _get_indexing_params —
      // the param family is `<index_field>_start/end` (`indexed_on` for
      // case-shaped tables, `UTC_start_time` for action_times,
      // CommCareAPIHandler.py:180-200); `action_times` sends no order_by
      val ob = orderBy.map(o => s"&order_by=$o").getOrElse("")
      val s = start.map(m => s"&${indexField}_start=${RestEnvelopeSource.fmtTs(m)}").getOrElse("")
      val e = endMicros.map(m => s"&${indexField}_end=${RestEnvelopeSource.fmtTs(m)}").getOrElse("")
      s"$base$ob$s$e$extra"
    } else s"$base$extra"
  }

  private def fetchPage(u: String): Unit = {
    requests += 1
    if (requests > maxRequests)
      throw new IllegalStateException(
        s"request budget exceeded: $requests > $maxRequests (R11, CommCareAPIHandler.py:217-224)")
    // cross-table run budget: executor-side add, driver-side read — the
    // driver (cli.runPull) aborts the run between table jobs once the
    // shared cap is spent
    budget.foreach(_.add(1L))
    val conn = new java.net.URL(u).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      // Reference sends `Authorization: ApiKey <token>` on every request
      // (CommCareAPIHandler.py:41-42; token lookup util.py:35-37 — the
      // secret-store lookup itself is out of scope, the header is not).
      authToken.foreach(t => conn.setRequestProperty("Authorization", s"ApiKey $t"))
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"APIError: HTTP $code from $u (util.py:8-27)")
      val root = mapper.readTree(conn.getInputStream)
      val objects = root.get("objects")
      val metaNext = Option(root.get("meta")).flatMap(m => Option(m.get("next")))
        .filter(!_.isNull).map(_.asText()).filter(_.nonEmpty)
      val objs = (0 until objects.size()).map(objects.get)
      buffer = objs.iterator
      nextUrl =
        if (objs.isEmpty) None
        else if (usesIndexedOn && orderBy.isEmpty) {
          // No server-side order_by (the `action_times` shape): the page
          // stream carries NO ordering guarantee, so a keyset restart from
          // the last row's timestamp could exclude unfetched rows that sort
          // earlier than it. The only sound continuation is the server's
          // own meta.next — exactly how the reference progresses this table
          // (CommCareAPIHandler.py:231 follows meta.next; :193-199 omits
          // order_by for action_times). A FULL page with no continuation is
          // ambiguous — possibly-more-rows with no sound way to fetch them —
          // and silent truncation is the one outcome this reader never
          // allows (same philosophy as the stuck-keyset guard below).
          if (metaNext.isEmpty && objs.size >= limit)
            throw new IllegalStateException(
              s"unordered pagination cannot continue: a full page of ${objs.size} " +
                "rows arrived with no meta.next continuation and no order_by to " +
                "drive a keyset restart; the server must provide envelope " +
                "continuations for this table shape")
          metaNext
        } else if (usesIndexedOn) {
          // R2 keyset: restart at the LAST row's indexed_on with >= —
          // faithful to CommCareAPIHandler.py:229-240 incl. duplicate
          // boundary rows (deduped downstream). "More pages remain" follows
          // the envelope's meta.next (the reference follows meta.next even
          // on the indexed_on path, :231); a full page is kept as a
          // fallback signal for envelope-less servers. Deciding on
          // `objs.size >= limit` ALONE would stop after page 1 whenever the
          // server caps pages below the requested limit (CommCare does).
          if (metaNext.isDefined || objs.size >= limit) {
            val last = RestEnvelopeSource.parseTsMicros(
              objs.last.get(indexField).asText())
            // Progress guard: if the restart equals the page's own start,
            // every row shares one index timestamp and a >= restart can
            // never advance. The reference would progress here by following
            // meta.next's server-provided continuation URL
            // (CommCareAPIHandler.py:231) — do the same when the envelope
            // offers one; the keyset restart resumes at the next page whose
            // last timestamp differs. Only when the server gives no
            // continuation is failing LOUDLY correct — silently skipping
            // past the timestamp (e.g. +1µs) would drop its unfetched rows.
            if (pageStart.contains(last)) {
              if (metaNext.isDefined) metaNext
              else
                throw new IllegalStateException(
                  s"keyset pagination stuck: a full page of ${objs.size} rows " +
                    s"shares $indexField=${RestEnvelopeSource.fmtTs(last)} and the " +
                    "server offered no meta.next continuation; raise `limit` above " +
                    "the per-timestamp row count or switch to cursor pagination")
            } else {
              pageStart = Some(last)
              Some(buildUrl(Some(last)))
            }
          } else None
        } else metaNext // R3 opaque cursor
    } finally conn.disconnect()
  }

  override def next(): Boolean = {
    while (!buffer.hasNext && nextUrl.isDefined) fetchPage(nextUrl.get)
    if (!buffer.hasNext) return false
    val obj = buffer.next()
    val id = Option(obj.get("id")).map(_.asLong()).getOrElse(-1L)
    // the typed core column is the table's INDEX timestamp — `indexed_on`
    // for case-shaped tables, `UTC_start_time` for action_times
    val ts = Option(obj.get(indexField)).map(n =>
      RestEnvelopeSource.parseTsMicros(n.asText()))
    current = InternalRow(
      id,
      ts.map(Long.box).orNull,
      UTF8String.fromString(obj.toString))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
