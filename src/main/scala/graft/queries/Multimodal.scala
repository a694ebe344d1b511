package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import TextOps.{h60, h60d}

/** Multimodal-column surface (SURVEY.md §2B north-star): treat media as
  * opaque `binary` payloads + typed metadata, with decode / feature-extract /
  * frame-sample as engine operators.
  *
  * Image decode is REAL: q32_decode / q32_pixel_embed run PNG bytes through
  * `javax.imageio` (encode and decode — both actual codec passes, zero new
  * dependencies) inside the 64-row `mapPartitions` batch slot. Because PNG
  * is lossless and the fixture pixels are md5-derived, the decoded
  * dimensions and pixel sums are reproducible by the SQL oracle without any
  * codec — the real-codec path is hash-checked end-to-end. Audio decode is
  * REAL too: q32_audio_decode round-trips md5-derived int16 PCM through the
  * JDK's WAV container codec (`javax.sound.sampled`), hash-checked the same
  * way. Video decode is real at the pipeline level: q32_video_frames
  * demuxes a framed container (GVID: length-prefixed PNG frames) and runs
  * every sampled frame through the same real ImageIO codec — only the
  * frame codec itself would swap for an ffmpeg-style library; the
  * lighter-weight q32_media_meta/q32_frame_sample lanes keep their
  * deterministic header stubs for the metadata-only shape.
  *
  * Scale: all narrow per-row transforms (no shuffle at all except final
  * test-only ORDER BY); codec/model init amortizes per 64-row batch exactly
  * like `mapInPandas`' Arrow batches.
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
    * Python `mapInPandas` worker would receive). The decode is REAL —
    * `javax.imageio` reads the PNG payload and reports the container format
    * and raster dimensions; undecodable payloads are dropped (quarantine
    * semantics, spec-covered). Narrow (no shuffle), so it scales with
    * executors. */
  final case class MediaIn(doc_id: Long, content: Array[Byte])
  final case class MediaOut(doc_id: Long, n_bytes: Long, format: String,
                            width: Long, height: Long)

  /** Container format as the codec registry names it ("png"), read from the
    * payload header — not trusted metadata. */
  private[graft] def sniffFormat(bytes: Array[Byte]): Option[String] = {
    // setUseCache here and in decodePng, not just in the encode closure:
    // these entry points must not depend on running pipelined after
    // imagesFrame's encoder in the same task (the default ImageInputStream
    // cache is a TEMP FILE per image — the measured 5.2 s → 0.56 s fix)
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (readers.hasNext) Some(readers.next().getFormatName.toLowerCase) else None
      } finally in.close()
    } catch {
      // quarantine, not crash: JDK readers throw RuntimeExceptions
      // (AIOOBE/NegativeArraySize/IllegalArgument) on malformed headers,
      // not only IOException
      case scala.util.control.NonFatal(_) => None
    }
  }

  private def decodeOne(m: MediaIn): Option[MediaOut] =
    for {
      fmt <- sniffFormat(m.content)
      (w, h, _) <- decodePng(m.content)
    } yield MediaOut(m.doc_id, m.content.length.toLong, fmt, w, h)

  def decodeBatched(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imagesFrame(spark, dir)
      .selectExpr("doc_id", "png AS content")
      .as[MediaIn]
      .mapPartitions { it =>
        // batch boundary: a real decoder amortizes codec/model init per
        // batch, exactly like mapInPandas' Arrow batches
        it.grouped(64).flatMap { batch => batch.flatMap(decodeOne) }
      }
      .toDF()
  }

  // --- Q32e: REAL image decode via javax.imageio (oracle-checked) ----------
  // The decode operator with an actual codec in the loop. Fixture images are
  // synthesized per doc (dims 4+doc_id%13 × 4+doc_id%11, pixel (x,y) RGB
  // packed from Hash60("doc:x:y")) and ENCODED to PNG with ImageIO.write;
  // the query then DECODES those bytes with ImageIO.read and reports what
  // the decoder saw: dimensions and the channel sum over the raster. PNG is
  // lossless, so the decoder's outputs equal the generator's arithmetic —
  // which the DuckDB oracle replays codec-free. Any decode infidelity
  // (color-model drift, truncation, header misread) breaks the hash gate.
  final case class ImgIn(doc_id: Long, png: Array[Byte])
  final case class ImgOut(doc_id: Long, width: Long, height: Long, pix_sum: Long)

  private[graft] def fixtureDims(docId: Long): (Int, Int) =
    (4 + (docId % 13).toInt, 4 + (docId % 11).toInt)

  /** One md5 per pixel; r/g/b are the low three bytes — the oracle repeats
    * this arithmetic on the shared Hash60 primitive. */
  private[graft] def pixelRgb(docId: Long, x: Int, y: Int): Int = {
    val h = graft.functions.Hash60(s"$docId:$x:$y")
    val (r, g, b) = ((h % 256L).toInt, ((h / 256L) % 256L).toInt, ((h / 65536L) % 256L).toInt)
    (r << 16) | (g << 8) | b
  }

  /** Real ImageIO PNG encode of the fixture raster. */
  private[graft] def encodePng(docId: Long): Array[Byte] = {
    val (w, h) = fixtureDims(docId)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelRgb(docId, x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real ImageIO decode: dims + sum of r+g+b over the raster; None when the
    * payload is not a decodable image (the quarantine path — a 100 TB corpus
    * always carries corrupt blobs, and a throwing decoder would kill the
    * stage). */
  private[graft] def decodePng(bytes: Array[Byte]): Option[(Long, Long, Long)] =
    try {
      javax.imageio.ImageIO.setUseCache(false) // see sniffFormat note
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)
            x += 1
          }
          y += 1
        }
        (img.getWidth.toLong, img.getHeight.toLong, sum)
      }
    } catch {
      // JDK image readers throw RuntimeExceptions on malformed payloads
      // (corrupt IHDR/palette → AIOOBE, NegativeArraySizeException, IAE),
      // not only IOException — the quarantine must catch them all or one
      // corrupt blob fails the task 4× and kills the job
      case scala.util.control.NonFatal(_) => None
    }

  /** documents → real PNG payloads (the binary media column). The doc table
    * scans as one-few file tasks, which would run the codec SERIALLY — the
    * repartition spreads encode across every core (a 5 000-row shuffle
    * buying 32× codec parallelism; measured 5.2 s → sub-second). ImageIO's
    * default ImageInputStream cache is a TEMP FILE per image — switched to
    * the memory cache at partition open (idempotent static set). */
  private[graft] def imagesFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cpus = spark.sparkContext.defaultParallelism
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .repartition(cpus)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // cheap static set, per-JVM
        it.grouped(64).flatMap(_.map(id => ImgIn(id, encodePng(id))))
      }
      .toDF()
  }

  /** Encode → decode round trip, both through the real codec. Corrupt
    * payloads would be dropped by the flatMap (quarantine semantics,
    * spec-covered); on the fixture corpus every image decodes. */
  def q32Decode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imagesFrame(spark, dir)
      .as[ImgIn]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(64).flatMap(_.flatMap(m =>
          decodePng(m.png).map { case (w, h, s) => ImgOut(m.doc_id, w, h, s) }))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q32DecodeSql: String = {
    val hh = h60d("doc_id::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR")
    s"""WITH dims AS (SELECT doc_id, 4 + (doc_id % 13) AS w, 4 + (doc_id % 11) AS h
       |              FROM documents),
       |px AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM dims),
       |pxy AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM px)
       |SELECT doc_id, CAST(min(w) AS BIGINT) AS width, CAST(min(h) AS BIGINT) AS height,
       |       CAST(sum(($hh) % 256 + (($hh) // 256) % 256 + (($hh) // 65536) % 256) AS BIGINT) AS pix_sum
       |FROM pxy GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // --- Q32f: decode → embed, chained end-to-end (oracle-checked) -----------
  // The full multimodal shape: real codec decode feeds the embedding stub's
  // INPUT (the decoded pixel statistics), so the lane is
  // decode → batch → embed rather than two disconnected stubs. The embed
  // vector is md5-derived from (doc_id, pix_sum) — deterministic, so the
  // oracle replays it from the same arithmetic; a real encoder replaces
  // `pixelEmbedOne` only.
  final case class PixEmbOut(doc_id: Long, pix_sum: Long, emb_norm: Double, emb_c1: Double)

  private def pixelEmbedOne(id: Long, pixSum: Long): PixEmbOut = {
    val v = (1 to 8).map(j =>
      (graft.functions.Hash60(s"$id:$pixSum:$j") % 2001L - 1000L) / 1000.0)
    val ss = v.foldLeft(0.0)((s, x) => s + x * x)
    PixEmbOut(id, pixSum, math.sqrt(ss), v.head)
  }

  def q32PixelEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imagesFrame(spark, dir)
      .as[ImgIn]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(64).flatMap(_.flatMap(m =>
          decodePng(m.png).map { case (_, _, s) => (m.doc_id, s) }))
      }
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, s) => pixelEmbedOne(id, s) }))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q32PixelEmbedSql: String = {
    val hh = h60d("doc_id::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR")
    val comp = (j: String) =>
      s"(${h60d(s"doc_id::VARCHAR || ':' || pix_sum::VARCHAR || ':' || $j")} % 2001 - 1000) / 1000.0"
    s"""WITH dims AS (SELECT doc_id, 4 + (doc_id % 13) AS w, 4 + (doc_id % 11) AS h
       |              FROM documents),
       |px AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM dims),
       |pxy AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM px),
       |ps AS (SELECT doc_id,
       |         CAST(sum(($hh) % 256 + (($hh) // 256) % 256 + (($hh) // 65536) % 256) AS BIGINT) AS pix_sum
       |       FROM pxy GROUP BY doc_id)
       |SELECT doc_id, pix_sum,
       |  sqrt(list_reduce(list_prepend(0.0,
       |    list_transform(list_transform(generate_series(1, 8), j -> ${comp("j::VARCHAR")}),
       |                   x -> x * x)), (s, x) -> s + x)) AS emb_norm,
       |  ${comp("'1'")} AS emb_c1
       |FROM ps ORDER BY doc_id""".stripMargin
  }

  // --- Q32g: REAL audio decode via javax.sound.sampled (oracle-checked) ----
  // The audio twin of q32_decode: fixture clips are synthesized per doc
  // (n = 200 + doc_id % 277 samples of md5-derived int16 PCM) and ENCODED
  // to WAV with AudioSystem.write; the query DECODES those bytes with
  // AudioSystem.getAudioInputStream and reports what the decoder saw —
  // frame count, format metadata, and the integer sample sum. PCM WAV is
  // lossless integer data, so the decoder's outputs equal the generator's
  // arithmetic, which the DuckDB oracle replays codec-free: any decode
  // infidelity (header misread, endianness, truncation) breaks the hash
  // gate. This retires the "audio stays a stub" caveat with zero new
  // dependencies; video remains the one stubbed codec (not in the JDK).
  final case class AudioIn(doc_id: Long, wav: Array[Byte])
  final case class AudioOut(doc_id: Long, n_samples: Long, sample_rate: Long,
                            channels: Long, sample_sum: Long)

  private[graft] def fixtureSampleCount(docId: Long): Int = 200 + (docId % 277).toInt

  /** One md5 per sample; value = h60 % 65536 − 32768 ∈ int16 exactly. */
  private[graft] def fixtureSample(docId: Long, i: Int): Short =
    ((graft.functions.Hash60(s"$docId:a:$i") % 65536L) - 32768L).toShort

  /** WAV container encode of the fixture PCM (16-bit mono LE @8kHz) — the
    * canonical 44-byte RIFF/WAVE/fmt/data layout, written directly.
    * AudioSystem.write produces byte-identical output for this format but
    * takes a per-call trip through the provider registry whose global
    * synchronization serialized all 32 executor threads (measured: the
    * encode stage at 1.34 s vs 0.05 s of actual single-thread work ×32).
    * The DECODE side keeps the real `javax.sound.sampled` codec — that is
    * the path under test; this is fixture synthesis. */
  private[graft] def encodeWav(docId: Long): Array[Byte] = {
    val n = fixtureSampleCount(docId)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(8000)           // sample rate
      .putInt(8000 * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(fixtureSample(docId, i)); i += 1 }
    bb.array()
  }

  /** Real WAV decode: frame count, format metadata, signed-sample sum; None
    * for undecodable payloads (quarantine — a 100 TB corpus always carries
    * corrupt blobs, and a throwing decoder would kill the stage). Only
    * 16-bit PCM is summed; anything else quarantines rather than guessing
    * a sample layout. Known JDK limitation (measured, ScaleSmoke 8×):
    * AudioSystem.getAudioInputStream's provider-registry lookup holds a
    * global lock, so many-core single-JVM decode serializes at ~0.24 ms/
    * payload; multi-executor deployments (fewer cores per JVM) dilute the
    * contention, and the lock is the price of keeping the REAL registry-
    * dispatched codec in the loop rather than a hand-rolled parser. */
  private[graft] def decodeWav(docId: Long, bytes: Array[Byte]): Option[AudioOut] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val data = ais.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < data.length) {
            // int16 per the container's declared endianness; sign from the
            // high byte's Java (signed) value
            val v: Int =
              if (fmt.isBigEndian) (data(i) << 8) | (data(i + 1) & 0xff)
              else (data(i + 1) << 8) | (data(i) & 0xff)
            sum += v
            i += 2
          }
          Some(AudioOut(docId, data.length / 2L, fmt.getSampleRate.toLong,
            fmt.getChannels.toLong, sum))
        }
      } finally ais.close()
    } catch {
      // UnsupportedAudioFileException, IOException, and the JDK parsers'
      // RuntimeExceptions on malformed headers all quarantine
      case scala.util.control.NonFatal(_) => None
    }

  def q32AudioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioFrame(spark, dir)
      .as[AudioIn]
      .mapPartitions(_.grouped(64).flatMap(_.flatMap(m => decodeWav(m.doc_id, m.wav))))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** documents → real WAV payloads; same codec-parallelism repartition as
    * imagesFrame (the container encode is the per-row cost). */
  private[graft] def audioFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cpus = spark.sparkContext.defaultParallelism
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .repartition(cpus)
      .mapPartitions(_.grouped(64).flatMap(_.map(id => AudioIn(id, encodeWav(id)))))
      .toDF()
  }

  val q32AudioDecodeSql: String = {
    val hh = h60d("doc_id::VARCHAR || ':a:' || i::VARCHAR")
    s"""WITH n AS (SELECT doc_id, 200 + (doc_id % 277) AS n FROM documents),
       |s AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM n)
       |SELECT doc_id, CAST(min(n) AS BIGINT) AS n_samples,
       |       CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
       |       CAST(sum(($hh) % 65536 - 32768) AS BIGINT) AS sample_sum
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // --- Q32h: REAL video-shaped decode — framed container + per-frame codec -
  // Retires the last documented stub (r6 verdict task 6). Video codecs are
  // not in the JDK, but a video PIPELINE's Spark-side work is container
  // demux + per-frame decode + frame sampling — all of which is real here,
  // zero new dependencies: fixture clips are GVID containers (magic,
  // frame count, then length-prefixed REAL PNG frames), and the query
  // demuxes the container and decodes every FrameStride-th frame through
  // the same javax.imageio codec q32_decode uses, in the 64-row batch
  // slot. PNG frames are lossless and md5-derived, so the decoded dims +
  // pixel sums are replayed codec-free by the DuckDB oracle — demux
  // misread, sampling drift, or decode infidelity all break the hash gate.
  // Quarantine is per-FRAME: a corrupt frame inside a valid container
  // drops that frame only; a corrupt/truncated container keeps its decoded
  // prefix (spec-covered). An ffmpeg-style codec would replace
  // encodeFramePng/decodePng only; the demux, stride, and schema are the
  // production plumbing.
  final case class VideoIn(doc_id: Long, video: Array[Byte])
  final case class FrameDecOut(doc_id: Long, frame_no: Long, width: Long,
                               height: Long, pix_sum: Long)

  /** Every FrameStride-th frame is decoded — the every-k-th-frame sampling
    * a training pipeline uses to bound per-clip cost. */
  private[graft] val FrameStride = 2

  private[graft] def fixtureVideoFrames(docId: Long): Int = 3 + (docId % 4).toInt
  private[graft] def fixtureVideoDims(docId: Long): (Int, Int) =
    (3 + (docId % 5).toInt, 3 + (docId % 3).toInt)

  /** Real ImageIO PNG encode of frame `frameNo`'s md5-derived raster. */
  private[graft] def encodeFramePng(docId: Long, frameNo: Int): Array[Byte] = {
    val (w, h) = fixtureVideoDims(docId)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val hh = graft.functions.Hash60(s"$docId:f:$frameNo:$x:$y")
        val rgb = (((hh % 256L).toInt) << 16) |
          ((((hh / 256L) % 256L).toInt) << 8) | ((hh / 65536L) % 256L).toInt
        img.setRGB(x, y, rgb); x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** GVID container: "GVID" magic, int32 frame count, then per frame an
    * int32 length + the PNG bytes (big-endian, ByteBuffer default). */
  private[graft] def encodeVideo(docId: Long): Array[Byte] = {
    val frames = (0 until fixtureVideoFrames(docId)).map(f => encodeFramePng(docId, f))
    val bb = java.nio.ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
    bb.put("GVID".getBytes("US-ASCII")).putInt(frames.size)
    frames.foreach(f => bb.putInt(f.length).put(f))
    bb.array()
  }

  /** Demux + sampled per-frame decode. Quarantine granularity:
    *  - bad magic / unparseable header → no rows (container quarantined);
    *  - truncated container → the decoded prefix survives;
    *  - corrupt frame bytes → that frame skipped (decodePng's None),
    *    later frames still decoded.
    * Skipped (non-sampled) frames cost one position() hop — never decoded. */
  private[graft] def decodeVideoSampled(docId: Long, bytes: Array[Byte],
                                        stride: Int): Seq[FrameDecOut] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      if (bb.remaining < 8) return Seq.empty
      val magic = new Array[Byte](4); bb.get(magic)
      if (new String(magic, "US-ASCII") != "GVID") return Seq.empty
      val n = bb.getInt
      if (n < 0) return Seq.empty
      val out = Seq.newBuilder[FrameDecOut]
      var f = 0
      var ok = true
      while (ok && f < n && bb.remaining >= 4) {
        val len = bb.getInt
        if (len < 0 || len > bb.remaining) ok = false // truncated: keep prefix
        else if (f % stride == 0) {
          val frame = new Array[Byte](len); bb.get(frame)
          decodePng(frame).foreach { case (w, h, s) =>
            out += FrameDecOut(docId, f.toLong, w, h, s)
          }
        } else bb.position(bb.position() + len)
        f += 1
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** documents → real GVID payloads; same codec-parallelism repartition as
    * imagesFrame (the per-frame PNG encode is the per-row cost). */
  private[graft] def videosFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cpus = spark.sparkContext.defaultParallelism
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .repartition(cpus)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(64).flatMap(_.map(id => VideoIn(id, encodeVideo(id))))
      }
      .toDF()
  }

  def q32VideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videosFrame(spark, dir)
      .as[VideoIn]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(64).flatMap(_.flatMap(m =>
          decodeVideoSampled(m.doc_id, m.video, FrameStride)))
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_no"))
  }

  val q32VideoFramesSql: String = {
    val hh = h60d("doc_id::VARCHAR || ':f:' || f::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR")
    s"""WITH nf AS (SELECT doc_id, 3 + (doc_id % 4) AS nf,
       |              3 + (doc_id % 5) AS w, 3 + (doc_id % 3) AS h
       |            FROM documents),
       |fr AS (SELECT doc_id, w, h, unnest(generate_series(0, nf - 1)) AS f FROM nf),
       |sf AS (SELECT * FROM fr WHERE f % $FrameStride = 0),
       |px AS (SELECT doc_id, f, w, h, unnest(generate_series(0, w - 1)) AS x FROM sf),
       |pxy AS (SELECT doc_id, f, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM px)
       |SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
       |       CAST(min(w) AS BIGINT) AS width, CAST(min(h) AS BIGINT) AS height,
       |       CAST(sum(($hh) % 256 + (($hh) // 256) % 256 + (($hh) // 65536) % 256) AS BIGINT) AS pix_sum
       |FROM pxy GROUP BY doc_id, f ORDER BY doc_id, frame_no""".stripMargin
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

  // --- Q32g: image near-dup via aHash fingerprints (multimodal dedup) ------
  // The dedup family's multimodal leg: every doc's PNG plus a PERTURBED
  // twin (packed RGB of pixel (0,0) incremented mod 2²⁴ — the
  // re-encoded-asset / one-pixel-watermark shape image dedup exists to
  // catch) go through the REAL ImageIO decode, each decoded raster is
  // fingerprinted with an average-hash (luminance-vs-window-mean bits over
  // the top-left ≤8×8 window, row-major bit y·8+x), and candidate pairs
  // come from a 4×16-bit BANDED equi-join on the hash — the q24_simhash
  // shape on image content. Verified pairs are hamming ≤ 3; on this corpus
  // that is exactly the 500 planted twins (nearest impostor measured at
  // hamming 5). Scale shape: decode+hash is row-local in the 64-row codec
  // batch slot; the join shuffles each image once on its band keys; a
  // viral band (all-black thumbnails at 100 TB) would route through the
  // same splitHotBuckets/grid machinery as the text lanes. Oracle: PNG
  // losslessness makes the decoded raster reproducible from the pixel
  // arithmetic, so DuckDB replays hash → bands → pairs bit-exactly
  // (bit 63 spelled as Long.MinValue — DuckDB refuses the 1<<63 shift;
  // band extraction is shift-then-mask, so arithmetic sign-extension
  // cancels on both engines).
  final case class ImgHash(img_id: Long, ahash: Long)
  private[graft] val TwinOff = 10000000L

  /** Base raster with pixel (0,0)'s packed RGB +1 (mod 2²⁴), encoded
    * through the same real codec. */
  private[graft] def encodePngPerturbed(baseId: Long): Array[Byte] = {
    val (w, h) = fixtureDims(baseId)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelRgb(baseId, x, y)); x += 1 }
      y += 1
    }
    img.setRGB(0, 0, (pixelRgb(baseId, 0, 0) + 1) & 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Average-hash of a DECODED raster: bit y·8+x set iff the pixel's
    * r+g+b luminance strictly exceeds the window mean (L·N > S — integer
    * comparison, no division). None = quarantine, like decodePng. */
  private[graft] def ahashOf(bytes: Array[Byte]): Option[Long] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
        val ww = math.min(img.getWidth, 8); val hh = math.min(img.getHeight, 8)
        val lum = Array.ofDim[Long](ww * hh)
        var s = 0L
        var y = 0
        while (y < hh) {
          var x = 0
          while (x < ww) {
            val rgb = img.getRGB(x, y)
            val l = ((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)
            lum(y * ww + x) = l; s += l; x += 1
          }
          y += 1
        }
        val n = (ww * hh).toLong
        var a = 0L
        y = 0
        while (y < hh) {
          var x = 0
          while (x < ww) {
            if (lum(y * ww + x) * n > s) a |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        a
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def q32PhashDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cpus = spark.sparkContext.defaultParallelism
    val hashes = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .repartition(cpus)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(64).flatMap(_.flatMap { id =>
          Seq(id -> encodePng(id), (id + TwinOff) -> encodePngPerturbed(id))
            .flatMap { case (imgId, png) => ahashOf(png).map(a => ImgHash(imgId, a)) }
        })
      }
      .toDF()
      // lazy cache: both sides of the band self-join (and the distinct)
      // read this frame — without it the real codec encodes+decodes the
      // corpus once per side. Lane-level cache hygiene (Bench/Verify/
      // QTime) drops it after the query, the repo convention.
      .persist()
    // Hot-bucket routing (r11 128×-sweep fix): the previous plain band
    // self-join had NO viral-bucket path — at 128× one 16-bit band value
    // collected enough images that a single distinct/join task ran ~27 min
    // (f² pairs inside one task), the exact straggler mode the text lanes'
    // splitHotBuckets exists for. Same machinery, same payload shape as
    // q24_simhash_pairs: cold buckets expand in place via the compiled
    // pair_expand_ids (which emits the bit_count(x^y) hamming directly),
    // viral buckets route raw rows through the 2-D grid salted join.
    val bands = hashes
      .withColumn("band_id", explode(expr("sequence(0, 3)")))
      .withColumn("bk", expr("shiftright(ahash, 16 * band_id) & 65535"))
      .select(col("band_id"), col("bk"),
        struct(col("img_id").as("doc_id"), col("ahash")).as("e"))
    val (cold, hotRaw) = graft.queries.Similarity.splitHotBuckets(
      bands, Seq("band_id", "bk"), graft.queries.Similarity.HotBucketCap)
    val coldPairs = cold
      .select(explode(expr("pair_expand_ids(ds)")).as("p"))
      .select(col("p.doc_a").as("img_a"), col("p.doc_b").as("img_b"), col("p.hamming"))
    val hotPairs = hotRaw.select(
      col("x.doc_id").as("img_a"), col("y.doc_id").as("img_b"),
      expr("CAST(bit_count(x.ahash ^ y.ahash) AS INT)").as("hamming"))
    // hamming filter BEFORE the distinct (r11 ADVICE): band collisions with
    // hamming > 3 are the bulk of candidate pairs on a real corpus — filter
    // row-locally so only true near-dups pay the distinct's exchange.
    coldPairs.unionByName(hotPairs)
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy(col("img_a"), col("img_b"))
  }

  val q32PhashDupSql: String = {
    val hh = h60d("base::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR")
    val bit = "CASE WHEN i.y * 8 + i.x = 63 THEN CAST(-9223372036854775808 AS BIGINT) " +
      "ELSE CAST(1 AS BIGINT) << (i.y * 8 + i.x) END"
    s"""WITH dims AS (SELECT doc_id AS base, 4 + (doc_id % 13) AS w, 4 + (doc_id % 11) AS h
       |              FROM documents),
       |win AS (SELECT base, least(w, 8) AS ww, least(h, 8) AS hh FROM dims),
       |px AS (SELECT base, ww, hh, unnest(generate_series(0, ww - 1)) AS x FROM win),
       |pxy AS (SELECT base, ww, hh, x, unnest(generate_series(0, hh - 1)) AS y FROM px),
       |lums0 AS (SELECT base, x, y,
       |            ($hh) % 256 AS r, (($hh) // 256) % 256 AS g, (($hh) // 65536) % 256 AS b
       |          FROM pxy),
       |imgs AS (
       |  SELECT base AS img_id, x, y, r + g + b AS lum FROM lums0
       |  UNION ALL
       |  SELECT base + 10000000, x, y,
       |         CASE WHEN x = 0 AND y = 0 THEN
       |           ((r * 65536 + g * 256 + b + 1) % 16777216) // 65536 % 256
       |           + ((r * 65536 + g * 256 + b + 1) % 16777216) // 256 % 256
       |           + ((r * 65536 + g * 256 + b + 1) % 16777216) % 256
       |         ELSE r + g + b END
       |  FROM lums0),
       |sums AS (SELECT img_id, sum(lum) AS S, count(*) AS N FROM imgs GROUP BY 1),
       |ah AS (SELECT i.img_id,
       |         bit_or(CASE WHEN i.lum * s.N > s.S THEN $bit ELSE 0 END) AS ahash
       |       FROM imgs i JOIN sums s USING (img_id) GROUP BY 1),
       |bk AS (SELECT img_id, ahash, band_id, (ahash >> (16 * band_id)) & 65535 AS k
       |       FROM (SELECT img_id, ahash, unnest(generate_series(0, 3)) AS band_id FROM ah))
       |SELECT DISTINCT a.img_id AS img_a, b2.img_id AS img_b,
       |       CAST(bit_count(xor(a.ahash, b2.ahash)) AS INT) AS hamming
       |FROM bk a JOIN bk b2 ON a.band_id = b2.band_id AND a.k = b2.k AND a.img_id < b2.img_id
       |WHERE bit_count(xor(a.ahash, b2.ahash)) <= 3
       |ORDER BY img_a, img_b""".stripMargin
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_phash_dup"    -> (q32PhashDup _),
    "q32_media_meta"   -> (q32MediaMeta _),
    "q32_frame_sample" -> (q32FrameSample _),
    "q32_embed_stub"   -> (q32EmbedStub _),
    "q32_resize_plan"  -> (q32ResizePlan _),
    "q32_decode"       -> (q32Decode _),
    "q32_pixel_embed"  -> (q32PixelEmbed _),
    "q32_audio_decode" -> (q32AudioDecode _),
    "q32_video_frames" -> (q32VideoFrames _),
  )

  val oracle: Map[String, String] = Map(
    "q32_phash_dup"    -> q32PhashDupSql,
    "q32_video_frames" -> q32VideoFramesSql,
    "q32_media_meta"   -> q32MediaMetaSql,
    "q32_frame_sample" -> q32FrameSampleSql,
    "q32_embed_stub"   -> q32EmbedStubSql,
    "q32_resize_plan"  -> q32ResizePlanSql,
    "q32_decode"       -> q32DecodeSql,
    "q32_pixel_embed"  -> q32PixelEmbedSql,
    "q32_audio_decode" -> q32AudioDecodeSql,
  )
}
