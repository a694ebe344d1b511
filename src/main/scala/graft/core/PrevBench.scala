package graft.core

/** Anchor-normalized round-over-round bench deltas (r12 VERDICT task 4).
  *
  * Rounds land on differently-clocked containers; r11→r12's "~2.5× slower
  * clock" normalization was a retrodiction no artifact could check. The
  * anchors (Calibration.measure/measureIo) ride every BENCH artifact since
  * r12, so Bench itself can now emit the normalized comparison — making
  * cross-round claims mechanical instead of prose.
  *
  * Input: the previous round's BENCH_r{N}.json — the DRIVER's wrapper
  * (pretty JSON with `tail` = last ~2 KB of the full line and `parsed` =
  * the compact line). Parsing is deliberately regex-tolerant: the fields
  * are flat name:number pairs in both layouts, and a missing field simply
  * drops out of the report rather than failing the bench.
  *
  * Conventions (all ratios: 1.0 = parity):
  *   - clock_ratio  = anchor_s_now / anchor_s_prev   (>1 = this box slower)
  *   - io_ratio     = anchor_io_now / anchor_io_prev (>1 = this disk faster)
  *   - time-like metrics divide by clock_ratio:   (t_now/t_prev)/clock
  *   - CPU-rate metrics multiply by clock_ratio:  (r_now/r_prev)*clock
  *   - fsync-bound rates divide by io_ratio:      (r_now/r_prev)/io
  * so every reported value reads "vs last round, same hardware".
  */
object PrevBench {

  final case class Prev(path: String, anchorS: Double, anchorIo: Double,
    totalNoop: Double, ingest: Double, streamWarm: Double, push: Double,
    lanes: Map[String, Double])

  // the wrapper's `tail` field holds a fragment of the full line as a JSON
  // STRING, so quotes inside it arrive escaped (\") — every pattern below
  // tolerates an optional backslash before each quote
  private def num(text: String, field: String): Option[Double] = {
    val m = ("\\\\?\"" + field + "\\\\?\"\\s*:\\s*(-?[0-9][0-9.eE+-]*)").r
      .findFirstMatchIn(text)
    m.flatMap(g => scala.util.Try(g.group(1).toDouble).toOption)
  }

  /** Lane times from a region that follows a `"queries":{` opener. */
  private def laneTimes(region: String): Map[String, Double] =
    "\\\\?\"(q[0-9][0-9a-z_]+)\\\\?\"\\s*:\\s*(-?[0-9][0-9.eE+-]*)".r
      .findAllMatchIn(region)
      .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble).toOption)
      .toMap

  /** Locate the previous BENCH artifact: explicit env wins, else the
    * highest-numbered BENCH_r*.json in the working directory. */
  def locate(): Option[java.io.File] =
    sys.env.get("SPARK_GRAFT_PREV_BENCH").map(new java.io.File(_))
      .filter(_.isFile)
      .orElse {
        val dir = new java.io.File(sys.props.getOrElse("user.dir", "."))
        Option(dir.listFiles()).toSeq.flatten
          .filter(f => f.getName.matches("BENCH_r\\d+\\.json"))
          .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
          .lastOption
      }

  def load(): Option[Prev] = locate().flatMap(load)

  def load(f: java.io.File): Option[Prev] = {
    val text = try new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    catch { case _: Throwable => "" }
    for {
      a <- num(text, "anchor_s")
      io <- num(text, "anchor_io_mbps")
      total <- num(text, "value")
    } yield {
      // lane dict(s): every region following a `"queries":{` opener —
      // the wrapper's tail fragment and the compact line both carry the
      // NOOP dict (identical values where they overlap)
      val lanes = "\\\\?\"queries\\\\?\"\\s*:\\s*\\{".r.findAllMatchIn(text)
        .map(m => text.substring(m.end, math.min(text.length, m.end + 16384))
          .takeWhile(_ != '}'))
        .map(laneTimes)
        .foldLeft(Map.empty[String, Double])(_ ++ _)
      Prev(f.getName, a, io, total,
        num(text, "ingest_rows_per_sec").getOrElse(-1.0),
        num(text, "stream_warm_rows_per_sec").getOrElse(-1.0),
        num(text, "push_rows_per_sec").getOrElse(-1.0),
        lanes)
    }
  }

  /** The `vs_prev_normalized` JSON object (or "null"). `noopNow` must hold
    * only lanes whose noop pass succeeded. */
  def report(anchorNow: Double, anchorIoNow: Double, totalNoopNow: Double,
      ingestNow: Double, streamWarmNow: Double, pushNow: Double,
      noopNow: collection.Map[String, Double],
      prev: Option[Prev] = load()): String =
    prev match {
      case None => "null"
      case Some(p) if p.anchorS <= 0 || anchorNow <= 0 => "null"
      case Some(p) =>
        def r3(v: Double) = math.rint(v * 1000) / 1000
        val clock = anchorNow / p.anchorS
        val io = if (p.anchorIo > 0 && anchorIoNow > 0) anchorIoNow / p.anchorIo else -1.0
        def timeRatio(now: Double, prev: Double): Option[Double] =
          if (now > 0 && prev > 0) Some((now / prev) / clock) else None
        def cpuRate(now: Double, prev: Double): Option[Double] =
          if (now > 0 && prev > 0) Some((now / prev) * clock) else None
        def ioRate(now: Double, prev: Double): Option[Double] =
          if (now > 0 && prev > 0 && io > 0) Some((now / prev) / io) else None
        // 5 biggest normalized per-lane movers among lanes big enough to
        // be signal (>= 0.5 s in either round) and present in both
        val movers = noopNow.toSeq.flatMap { case (lane, tNow) =>
          p.lanes.get(lane)
            .filter(tPrev => tPrev >= 0.5 || tNow >= 0.5)
            .map(tPrev => lane -> (tNow / tPrev) / clock)
        }.sortBy { case (_, r) => -math.abs(math.log(r)) }.take(5)
        val parts = Seq(
          Some(s""""prev":"${p.path}""""),
          Some(s""""clock_ratio":${r3(clock)}"""),
          if (io > 0) Some(s""""io_ratio":${r3(io)}""") else None,
          timeRatio(totalNoopNow, p.totalNoop).map(v => s""""total_noop":${r3(v)}"""),
          ioRate(ingestNow, p.ingest).map(v => s""""ingest":${r3(v)}"""),
          ioRate(streamWarmNow, p.streamWarm).map(v => s""""stream_warm":${r3(v)}"""),
          cpuRate(pushNow, p.push).map(v => s""""push":${r3(v)}"""),
          Some(movers.map { case (l, r) => s""""$l":${r3(r)}""" }
            .mkString("\"movers\":{", ",", "}"))
        ).flatten
        parts.mkString("{", ",", "}")
    }
}
