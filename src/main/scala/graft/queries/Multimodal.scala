package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import TextOps.{h60, h60d}

/** Multimodal-column surface (SURVEY.md §2B north-star): treat media as
  * opaque `binary` payloads + typed metadata, with decode / feature-extract /
  * frame-sample as engine operators.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB:
  * a deterministic md5-derived fake (documented per-column below) standing in
  * for a real `mapPartitions`-batched codec call. Everything around it —
  * the binary column, the metadata struct schema, the per-frame explode,
  * partition-preserving shapes — is the real plumbing a 100 TB media
  * pipeline needs, and is exercised end-to-end against the oracle.
  *
  * Scale: all narrow per-row transforms (no shuffle at all except final
  * test-only ORDER BY); a real decoder slots into the same column positions
  * via `mapPartitions` batching without changing the query shape.
  */
object Multimodal {
  // --- Q32a: binary payload + decoded metadata struct ----------------------
  // content: the document's UTF-8 bytes as a BINARY column (stand-in for an
  // image blob). Decode stub: format from doc_id mod 3; width/height from
  // the 60-bit md5 hash of doc_id — deterministic, codec-free.
  def q32MediaMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("content", col("text").cast("binary"))
      .withColumn("h", expr(h60("CAST(doc_id AS STRING)")))
      .select(
        col("doc_id"),
        length(col("content")).cast("long").as("n_bytes"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END").as("format"),
        (lit(64L) + pmod(col("h"), lit(577L))).as("width"),   // decode stub
        (lit(64L) + pmod(col("h"), lit(449L))).as("height"),  // decode stub
        md5(col("text")).as("content_md5"))
      .orderBy(col("doc_id"))

  val q32MediaMetaSql: String =
    s"""SELECT doc_id,
       |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
       |  64 + (${h60d("doc_id::VARCHAR")} % 577) AS width,
       |  64 + (${h60d("doc_id::VARCHAR")} % 449) AS height,
       |  md5(text) AS content_md5
       |FROM documents ORDER BY doc_id""".stripMargin

  // --- Q32b: frame sampling — k evenly-spaced 64-byte "frames" per doc -----
  // The video-pipeline shape: explode a per-row frame index, slice the
  // payload at computed offsets, fingerprint each frame. A real frame
  // decoder replaces the substring+md5 with a codec call; the offsets,
  // explode, and output schema are the production plumbing.
  def q32FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_bytes", length(col("text")).cast("long"))
      .withColumn("k", least(lit(4L), greatest(expr("n_bytes div 64"), lit(1L))))
      .withColumn("frame_no", explode(expr("sequence(0L, k - 1L)")))
      .withColumn("off", col("frame_no") * expr("n_bytes div k"))
      .select(
        col("doc_id"), col("frame_no"), col("off"),
        md5(expr("substr(text, CAST(off + 1 AS INT), 64)")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_no"))

  val q32FrameSampleSql: String =
    """SELECT doc_id, frame_no, frame_no * (n_bytes // k) AS off,
      |       md5(substr(text, CAST(frame_no * (n_bytes // k) + 1 AS INT), 64)) AS frame_md5
      |FROM (
      |  SELECT doc_id, text, n_bytes, k,
      |         unnest(generate_series(CAST(0 AS BIGINT), k - 1)) AS frame_no
      |  FROM (SELECT doc_id, text,
      |          CAST(length(text) AS BIGINT) AS n_bytes,
      |          least(CAST(4 AS BIGINT), greatest(CAST(length(text) AS BIGINT) // 64, 1)) AS k
      |        FROM documents))
      |ORDER BY doc_id, frame_no""".stripMargin

  // --- Q32d: resize PLANNING — fit-within-256² target dimensions -----------
  // The resize operator's arithmetic layer over the decode-stub dims: scale
  // = min(256/w, 256/h, 1) (never upscale), target dims floored, aspect
  // ratio preserved. A real resizer consumes (content, out_w, out_h) in the
  // same mapPartitions batch slot as decodeBatched; the planning math here
  // IS the production logic. floor() not round() — round() diverges
  // cross-engine. Row-local, scan-speed.
  def q32ResizePlan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", expr(h60("CAST(doc_id AS STRING)")))
      .select(
        col("doc_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END").as("format"),
        (lit(64L) + pmod(col("h"), lit(577L))).as("width"),
        (lit(64L) + pmod(col("h"), lit(449L))).as("height"))
      .withColumn("scale",
        least(lit(256.0) / col("width"), lit(256.0) / col("height"), lit(1.0)))
      .select(
        col("doc_id"), col("format"), col("width"), col("height"), col("scale"),
        greatest(expr("CAST(floor(width * scale) AS BIGINT)"), lit(1L)).as("out_w"),
        greatest(expr("CAST(floor(height * scale) AS BIGINT)"), lit(1L)).as("out_h"))
      .orderBy(col("doc_id"))

  val q32ResizePlanSql: String =
    s"""WITH m AS (SELECT doc_id,
       |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
       |  64 + (${h60d("doc_id::VARCHAR")} % 577) AS width,
       |  64 + (${h60d("doc_id::VARCHAR")} % 449) AS height
       |  FROM documents),
       |s AS (SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS scale FROM m)
       |SELECT doc_id, format, width, height, scale,
       |       greatest(CAST(floor(width * scale) AS BIGINT), 1) AS out_w,
       |       greatest(CAST(floor(height * scale) AS BIGINT), 1) AS out_h
       |FROM s ORDER BY doc_id""".stripMargin

  /** The external-codec integration shape: `mapPartitions` over typed rows,
    * decoding in BATCHES of 64 (the Arrow-batch shape a real decoder or a
    * Python `mapInPandas` worker would receive). The decode itself is the
    * same deterministic md5 stub as q32_media_meta — a real codec replaces
    * `decodeOne` only; partitioning, batching, schema stay as-is. Narrow
    * (no shuffle), so it scales with executors. */
  final case class MediaIn(doc_id: Long, content: Array[Byte])
  final case class MediaOut(doc_id: Long, n_bytes: Long, format: String,
                            width: Long, height: Long)

  private def decodeOne(m: MediaIn): MediaOut = {
    val h = graft.functions.Hash60(m.doc_id.toString)
    val fmt = (m.doc_id % 3) match {
      case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
    }
    MediaOut(m.doc_id, m.content.length.toLong, fmt, 64L + h % 577L, 64L + h % 449L)
  }

  def decodeBatched(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "CAST(text AS BINARY) AS content")
      .as[MediaIn]
      .mapPartitions { it =>
        // batch boundary: a real decoder amortizes codec/model init per
        // batch, exactly like mapInPandas' Arrow batches
        it.grouped(64).flatMap { batch => batch.map(decodeOne) }
      }
      .toDF()
  }

  // --- Q32c: batched embedding-INFERENCE stub (oracle-checked) -------------
  // The GPU-inference batching shape as a first-class checked query: typed
  // `mapPartitions`, model invoked per 64-row batch (a real encoder replaces
  // `embedOne`; init amortizes per batch exactly like mapInPandas' Arrow
  // batches). The stub emits an 8-dim md5-derived vector; the checked
  // output is scalar projections (norm + first component) because the
  // checked surface bans array columns. Narrow — scales with executors.
  final case class EmbOut(doc_id: Long, emb_norm: Double, emb_c1: Double)

  private def embedOne(id: Long): EmbOut = {
    val v = (1 to 8).map(j =>
      (graft.functions.Hash60(s"$id:$j") % 2001L - 1000L) / 1000.0)
    // left-fold sum of squares — same association as the oracle's list_reduce
    val ss = v.foldLeft(0.0)((s, x) => s + x * x)
    EmbOut(id, math.sqrt(ss), v.head)
  }

  def q32EmbedStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.grouped(64).flatMap(_.map(embedOne)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q32EmbedStubSql: String = {
    val comp = (j: String) =>
      s"(${h60d(s"doc_id::VARCHAR || ':' || $j")} % 2001 - 1000) / 1000.0"
    s"""SELECT doc_id,
       |  sqrt(list_reduce(list_prepend(0.0,
       |    list_transform(list_transform(generate_series(1, 8), j -> ${comp("j::VARCHAR")}),
       |                   x -> x * x)), (s, x) -> s + x)) AS emb_norm,
       |  ${comp("'1'")} AS emb_c1
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_media_meta"   -> (q32MediaMeta _),
    "q32_frame_sample" -> (q32FrameSample _),
    "q32_embed_stub"   -> (q32EmbedStub _),
    "q32_resize_plan"  -> (q32ResizePlan _),
  )

  val oracle: Map[String, String] = Map(
    "q32_media_meta"   -> q32MediaMetaSql,
    "q32_frame_sample" -> q32FrameSampleSql,
    "q32_embed_stub"   -> q32EmbedStubSql,
    "q32_resize_plan"  -> q32ResizePlanSql,
  )
}
