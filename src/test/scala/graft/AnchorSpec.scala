package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench calibration anchors (core/Calibration.scala) are artifact
  * format — BENCH_r{N}.json cross-round ratios divide by them — so their
  * basic contract gets pinned: both return positive finite values, the CPU
  * anchor is deterministic work (two short runs land within a loose band of
  * each other on an otherwise-idle JVM), and the I/O anchor leaves no temp
  * files behind. No Spark session needed — the anchors must run before one
  * exists.
  */
class AnchorSpec extends AnyFunSuite {

  test("cpu anchor returns a positive finite time, repeatably") {
    val a = graft.core.Calibration.measure(reps = 1, warmups = 1)
    val b = graft.core.Calibration.measure(reps = 1, warmups = 0)
    assert(a > 0 && a.isFinite, s"anchor_s=$a")
    assert(b > 0 && b.isFinite, s"anchor_s=$b")
    // same deterministic workload on a warmed JVM: an order-of-magnitude
    // divergence means the kernel changed, not that the box is noisy
    assert(a / b < 10 && b / a < 10, s"anchor passes diverged: $a vs $b")
  }

  test("mt anchor: positive finite wall time, thread rule min(8, cores)") {
    val t = graft.core.Calibration.mtThreads
    assert(t === math.min(8, Runtime.getRuntime.availableProcessors()))
    val a = graft.core.Calibration.measureMt(reps = 1)
    assert(a > 0 && a.isFinite, s"anchor_mt_s=$a")
    // parallel wall time can't beat one single-thread pass by much: the
    // kernel is fixed, so mt ≈ single-thread time under no contention and
    // grows with oversubscription — never collapses toward zero
    val single = graft.core.Calibration.measure(reps = 1, warmups = 0)
    assert(a > single / 4, s"mt=$a vs single=$single — mt kernel degenerated")
  }

  test("io anchor returns positive MB/s and cleans up its temp file") {
    // probe placement follows measureIo's rule (r12 ADVICE): the process
    // working directory when writable (the filesystem the bench's writes
    // actually hit — tmpdir can be tmpfs), else tmpdir
    val cwd = java.nio.file.Paths.get(System.getProperty("user.dir", "."))
    val tmp =
      if (java.nio.file.Files.isWritable(cwd)) cwd
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    def probes() = {
      val s = java.nio.file.Files.list(tmp)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.startsWith("graft_anchor_io"))
      } finally s.close()
    }
    val before = probes()
    val mbps = graft.core.Calibration.measureIo(reps = 1)
    assert(mbps > 0 && mbps.isFinite, s"anchor_io_mbps=$mbps")
    assert(probes() === before, "io anchor leaked a temp file")
  }
}
