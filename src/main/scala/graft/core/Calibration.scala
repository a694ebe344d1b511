package graft.core

/** Cross-container bench calibration anchor (r11 VERDICT task 2).
  *
  * Round-over-round bench deltas were unreadable because consecutive rounds
  * land on differently-clocked containers (r10→r11 measured ~2.5–3× apart
  * on identical code), so "ingest 236 k → 187 k rows/s" could be a
  * regression or a slower box — indistinguishable from the artifacts alone.
  *
  * `measure()` times a FIXED, deterministic, single-threaded CPU+memory
  * workload — xorshift64* fill of an 8M-long array, `Arrays.sort`, then a
  * fold — that exercises the same instruction mix Spark's row processing
  * leans on (branchy compare-heavy sort + sequential bandwidth) and has no
  * dependence on Spark, disk, or data. Bench emits the median-of-5 (after
  * 2 JIT warmups) as `anchor_s` in BENCH_r{N}.json; two rounds' numbers
  * divide into a clock ratio, and per-lane times divide by it into
  * normalized units that compare across containers.
  *
  * The workload is fixed FOREVER: changing the array size or the kernel
  * invalidates every cross-round ratio, so treat the constants below as
  * part of the artifact format.
  */
object Calibration {
  private val N = 1 << 23 // 8M longs = 64 MB — larger than any L3, so the
                          // sort pays real memory traffic, not just cache

  /** One anchor pass: deterministic fill → sort → fold. Returns the fold
    * so the JIT cannot dead-code the work. */
  private def pass(): Long = {
    val a = new Array[Long](N)
    var x = 0x9E3779B97F4A7C15L // fixed seed — identical work every call
    var i = 0
    while (i < N) {
      // xorshift64* — cheap, full-period, deterministic
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      a(i) = x * 0x2545F4914F6CDD1DL
      i += 1
    }
    java.util.Arrays.sort(a)
    var s = 0L
    i = 0
    while (i < N) { s ^= a(i) + i; i += 1 }
    s
  }

  /** Median-of-`reps` anchor seconds after `warmups` unrecorded JIT passes.
    * Single-threaded by design: it measures the CLOCK, not the core count
    * (core count is already reported via SPARK_GRAFT_CPUS). */
  def measure(reps: Int = 5, warmups: Int = 2): Double = {
    var sink = 0L
    (0 until warmups).foreach(_ => sink ^= pass())
    val times = (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      sink ^= pass()
      (System.nanoTime() - t0) / 1e9
    }
    // sink escapes via a side effect the JIT must honor
    if (sink == 42L) System.err.println("[anchor] unlikely sink")
    times.sorted.apply(reps / 2)
  }

  /** Multi-core anchor (r13 VERDICT task 2): wall seconds for
    * `min(8, cores)` CONCURRENT passes of the same frozen kernel,
    * median-of-`reps` after one parallel warmup.
    *
    * Exists because the single-thread anchor measures the CLOCK and the IO
    * anchor the DISK, but neither can attribute a MULTI-CORE throughput
    * deficit: r13's ~15% uniform normalized elevation across ~150 untouched
    * lanes (host CPU oversubscription — sibling VMs stealing cores — reads
    * as parity on one thread and as a uniform lane tax under Spark's 32-way
    * parallelism) was explained only by prose and standalone spot-checks.
    * anchor_mt_s / anchor_s across two rounds separates "slower clock"
    * (both move together) from "fewer effective cores" (mt moves alone).
    *
    * The thread count is `min(8, availableProcessors)` and is EMITTED next
    * to the number (`anchor_mt_threads`): on the standard 32-core bench
    * container it is the constant 8, so cross-round ratios hold; a
    * different container shape is visible in the artifact rather than
    * silently skewing the ratio. Same fixed-forever contract as the other
    * anchors: the kernel, rep structure, and thread rule are artifact
    * format. */
  def mtThreads: Int = math.min(8, Runtime.getRuntime.availableProcessors())

  def measureMt(reps: Int = 5): Double = {
    val t = mtThreads
    val pool = java.util.concurrent.Executors.newFixedThreadPool(t)
    try {
      def onePass(): Double = {
        val t0 = System.nanoTime()
        val tasks = (0 until t).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long = pass()
          })
        }
        var sink = 0L
        tasks.foreach(f => sink ^= f.get())
        if (sink == 42L) System.err.println("[anchor] unlikely mt sink")
        (System.nanoTime() - t0) / 1e9
      }
      // one parallel warmup: the single-thread anchor's JIT passes already
      // compiled the kernel, but the pool threads pay first-touch
      onePass()
      (0 until reps).map(_ => onePass()).sorted.apply(reps / 2)
    } finally pool.shutdownNow()
  }

  /** I/O anchor (r12): durable-write bandwidth of the bench filesystem,
    * MB/s, median of `reps` 64 MB dsync-chunked writes to a temp file.
    *
    * Exists because the CPU anchor cannot explain an I/O-noise window:
    * observed this round — a Bench run with anchor_s only 21% off the
    * same-box baseline measured ingest 3.6× and push 28× slower (host-level
    * disk contention, invisible from inside the VM; a dd probe minutes
    * later was back to 334 MB/s). The fsync-bound bars (ingest, stream,
    * push) are the ones such a window fails; `anchor_io_mbps` in the same
    * JSON makes the cause readable from the artifact alone. Report-only,
    * no pass bar — same contract as anchor_s. The workload (64 MB in 4 MB
    * FORCE'd chunks) is fixed for the same cross-round-ratio reason.
    *
    * Probe placement (r12 ADVICE): java.io.tmpdir is tmpfs on many container
    * hosts, where a DSYNC write measures MEMORY — a plausible-looking MB/s
    * that cannot diagnose the disk contention the anchor exists for. The
    * probe therefore writes under the process working directory (the same
    * filesystem Bench's ingest/shuffle output hits — both resolve under the
    * repo checkout) and LOGS the resolved path, so a reading taken against
    * the wrong filesystem is recognizable from the artifact's stderr. */
  def measureIo(reps: Int = 3): Double = {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val chunk = java.nio.ByteBuffer.allocate(4 << 20)
    val probeDir = {
      val cwd = Paths.get(sys.props.getOrElse("user.dir", "."))
      if (Files.isWritable(cwd)) cwd
      else Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    }
    System.err.println(s"[anchor] io probe dir: ${probeDir.toAbsolutePath}")
    val rates = (0 until reps).map { _ =>
      val f = Files.createTempFile(probeDir, "graft_anchor_io", ".bin")
      val ch = java.nio.channels.FileChannel.open(f,
        StandardOpenOption.WRITE, StandardOpenOption.DSYNC)
      val t0 = System.nanoTime()
      try {
        var i = 0
        while (i < 16) { // 16 × 4 MB = 64 MB
          chunk.clear()
          while (chunk.hasRemaining) ch.write(chunk)
          i += 1
        }
        ch.force(false)
      } finally { ch.close(); Files.deleteIfExists(f); () }
      64.0 / ((System.nanoTime() - t0) / 1e9)
    }
    rates.sorted.apply(reps / 2)
  }
}
