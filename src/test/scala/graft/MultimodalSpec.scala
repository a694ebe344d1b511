package graft

import org.apache.spark.sql.functions._
import graft.queries.Multimodal
import graft.functions.BatchSizeAgg

/** Specs for the multimodal batched-decode path and the typed Aggregator. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBatched runs the REAL ImageIO codec: sniffed format + decoded dims") {
    val rows = Multimodal.decodeBatched(spark, sf001)
      .select($"doc_id", $"n_bytes", $"format", $"width", $"height")
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) > 0L)            // real PNG payload, not empty
      assert(r.getString(2) === "png")     // sniffed from the header
      assert(r.getLong(3) === 4 + id % 13) // decoded, not copied from input
      assert(r.getLong(4) === 4 + id % 11)
    }
  }

  test("decodePng round-trips a handcrafted image exactly (lossless contract)") {
    // 3×2 raster with known channel values: decode must return them bit-exact
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val pix = Seq((0, 0, 0x010203), (1, 0, 0xFF0000), (2, 0, 0x00FF00),
                  (0, 1, 0x0000FF), (1, 1, 0x808080), (2, 1, 0xFFFFFF))
    pix.foreach { case (x, y, rgb) => img.setRGB(x, y, rgb) }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val expected = pix.map { case (_, _, rgb) =>
      ((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255) }.map(_.toLong).sum
    assert(Multimodal.decodePng(out.toByteArray) === Some((3L, 2L, expected)))
  }

  test("decodePng quarantines undecodable payloads instead of throwing") {
    assert(Multimodal.decodePng("not an image".getBytes("UTF-8")) === None)
    assert(Multimodal.decodePng(Array.emptyByteArray) === None)
    // truncated real PNG: header sniffs but the raster is unreadable
    val whole = Multimodal.encodePng(7L)
    assert(Multimodal.decodePng(whole.take(20)) === None)
  }

  test("decodeWav round-trips the fixture PCM exactly (lossless contract)") {
    val id = 42L
    val out = Multimodal.decodeWav(id, Multimodal.encodeWav(id))
    val n = Multimodal.fixtureSampleCount(id)
    val expectedSum = (0 until n).map(i => Multimodal.fixtureSample(id, i).toLong).sum
    assert(out === Some(Multimodal.AudioOut(id, n.toLong, 8000L, 1L, expectedSum)))
  }

  test("decodeWav quarantines undecodable payloads instead of throwing") {
    assert(Multimodal.decodeWav(1L, "not audio".getBytes("UTF-8")) === None)
    assert(Multimodal.decodeWav(1L, Array.emptyByteArray) === None)
    // truncated real WAV: RIFF header sniffs but the data chunk is cut short
    val whole = Multimodal.encodeWav(7L)
    assert(Multimodal.decodeWav(7L, whole.take(16)) === None)
    // a stereo/8-bit container would not match the summing contract: build
    // an 8-bit mono WAV and confirm it quarantines rather than mis-sums
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array[Byte](1, 2, 3, 4)), fmt8, 4L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.decodeWav(1L, bos.toByteArray) === None)
  }

  test("q32_audio_decode: real codec over the synthesized corpus, one row per doc") {
    val rows = Multimodal.q32AudioDecode(spark, sf001).collect()
    assert(rows.length === 500)
    rows.take(10).foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === Multimodal.fixtureSampleCount(id).toLong)
      assert(r.getLong(2) === 8000L)
      assert(r.getLong(3) === 1L)
    }
  }

  test("decode → embed chain: q32_pixel_embed consumes the DECODED pixel sum") {
    val row = Multimodal.q32PixelEmbed(spark, sf001)
      .filter($"doc_id" === 3L).head()
    // recompute the expected pixel sum from the generator arithmetic — the
    // query must have obtained the same number through encode+decode
    val (w, h) = Multimodal.fixtureDims(3L)
    val expected = (for { x <- 0 until w; y <- 0 until h } yield {
      val rgb = Multimodal.pixelRgb(3L, x, y)
      (((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)).toLong
    }).sum
    assert(row.getLong(1) === expected)
    assert(row.getDouble(2) > 0.0) // embed norm derived from (doc_id, pix_sum)
  }

  test("video demux: stride sampling decodes exactly the even frames, bit-faithful") {
    val id = 6L // 3 + 6%4 = 5 frames → sampled {0, 2, 4}
    val rows = Multimodal.decodeVideoSampled(id, Multimodal.encodeVideo(id),
      Multimodal.FrameStride)
    assert(rows.map(_.frame_no) === Seq(0L, 2L, 4L))
    val (w, h) = Multimodal.fixtureVideoDims(id)
    rows.foreach { r =>
      assert(r.width === w.toLong && r.height === h.toLong)
      // replay the generator arithmetic: the decoder must have recovered
      // the exact raster through the real PNG codec
      val expected = (for { x <- 0 until w; y <- 0 until h } yield {
        val hh = graft.functions.Hash60(s"$id:f:${r.frame_no}:$x:$y")
        (hh % 256L) + ((hh / 256L) % 256L) + ((hh / 65536L) % 256L)
      }).sum
      assert(r.pix_sum === expected, s"frame ${r.frame_no}")
    }
  }

  test("video quarantine: corrupt frame drops that frame only; bad container drops all; truncation keeps the prefix") {
    val id = 6L
    val good = Multimodal.encodeVideo(id)
    // (1) one corrupt frame inside a valid container: rebuild the container
    // with frame 2's PNG bytes zeroed — frames 0 and 4 must still decode
    val frames = (0 until Multimodal.fixtureVideoFrames(id))
      .map(f => Multimodal.encodeFramePng(id, f))
    val bb = java.nio.ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
    bb.put("GVID".getBytes("US-ASCII")).putInt(frames.size)
    frames.zipWithIndex.foreach { case (fr, i) =>
      val payload = if (i == 2) new Array[Byte](fr.length) else fr
      bb.putInt(payload.length).put(payload)
    }
    val oneBad = Multimodal.decodeVideoSampled(id, bb.array(), Multimodal.FrameStride)
    assert(oneBad.map(_.frame_no) === Seq(0L, 4L))
    // (2) garbage container: no rows, no crash
    assert(Multimodal.decodeVideoSampled(id, Array.fill[Byte](64)(7), 2).isEmpty)
    // (3) truncated container: decoded prefix survives (cut mid-frame-4)
    val cut = java.util.Arrays.copyOf(good, good.length - frames.last.length / 2)
    assert(Multimodal.decodeVideoSampled(id, cut, Multimodal.FrameStride)
      .map(_.frame_no) === Seq(0L, 2L))
  }

  test("BatchSizeAgg: one-pass stats match groupBy aggregates; limit suggestion bounded") {
    val bytes = Seq(100L, 200L, 300L, 150L, 250L)
    val ds = bytes.toDS()
    val stats = ds.select(BatchSizeAgg.agg.toColumn).head()
    assert(stats.count === 5)
    assert(stats.totalBytes === bytes.sum)
    assert(stats.maxBytes === 300L)
    assert(stats.avgBytes === bytes.sum.toDouble / 5)
    assert(stats.suggestedLimit > 0 && stats.suggestedLimit <= 10000)
  }

  test("BatchSizeAgg distributes: partial+final merge equals single-partition result") {
    val bytes = (1L to 1000L).toDS()
    val many = bytes.repartition(8).select(BatchSizeAgg.agg.toColumn).head()
    val one = bytes.coalesce(1).select(BatchSizeAgg.agg.toColumn).head()
    assert(many === one)
  }
}
