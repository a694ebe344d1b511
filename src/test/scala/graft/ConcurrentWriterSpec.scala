package graft

import graft.streaming.{StreamingJobs, VersionStore}

/** VersionStore optimistic concurrency — the multi-job failure mode one
  * step past VacuumSpec: two writers racing `v=<id>` directories. Pins:
  *  (1) a rival committing INSIDE the first writer's commit critical
  *      section (via the beforeCommitCheck seam) is detected — the first
  *      writer aborts loudly, publishes nothing, and the rival's version
  *      is intact (no silent lost update in either direction);
  *  (2) the aborted writer retries against the new latest and succeeds,
  *      with the rival's changes PRESENT in the final state (the lost
  *      update the unguarded scheme would have silently dropped);
  *  (3) single-writer replay (crash-and-rerun of the same batch id) is
  *      still idempotent through the guarded path;
  *  (4) a failed commit leaves no staging debris behind.
  */
class ConcurrentWriterSpec extends SparkSpec {
  import spark.implicits._

  private def state(dir: String): Set[(Long, Double, String)] = {
    val v = StreamingJobs.listVersions(dir).max
    spark.read.parquet(s"$dir/v=$v")
      .select("o_orderkey", "price", "status")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
  }

  test("a rival commit inside the critical section aborts the writer loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ccw").toString
    StreamingJobs.applyCdcBatch(
      Seq(Chg(1L, "insert", 1.0, "A", in_chg = true)).toDF(), dir, 0L)

    // Writer A prepares batch 1 (derives from v=0); just before A's
    // recheck, writer B commits batch 2 — ALSO derived from v=0, exactly
    // the race the unguarded scheme loses. B runs on another thread
    // because A holds the commit lock inside the seam.
    val bDf = Seq(Chg(3L, "insert", 3.0, "B", in_chg = true)).toDF()
    val rival = new Thread(() =>
      StreamingJobs.applyCdcBatch(bDf, dir, 2L))
    val e = intercept[java.util.ConcurrentModificationException] {
      StreamingJobs.applyCdcBatchGuarded(
        Seq(Chg(2L, "insert", 2.0, "A", in_chg = true)).toDF(), dir, 1L,
        beforeCommitCheck = () => {
          // release the lock for the rival: it must acquire, commit, and
          // finish before A proceeds to its recheck
          val lock = java.nio.file.Paths.get(dir, "_graft_commit.lock")
          java.nio.file.Files.deleteIfExists(lock)
          rival.start(); rival.join()
          java.nio.file.Files.createFile(lock) // restore A's hold
        })
    }
    assert(e.getMessage.contains("concurrent writer"))
    // B's version is intact, A published nothing
    assert(StreamingJobs.listVersions(dir).sorted == Seq(0L, 2L))
    assert(state(dir) == Set((1L, 1.0, "A"), (3L, 3.0, "B")))
    // no staging debris from the aborted attempt
    val leftovers = new java.io.File(dir).listFiles
      .map(_.getName).filter(_.startsWith("_staging_"))
    assert(leftovers.isEmpty, s"staging debris: ${leftovers.mkString(",")}")

    // (2) the aborted writer re-derives from the NEW latest and succeeds;
    // the rival's row survives — the lost update the guard exists to stop
    StreamingJobs.applyCdcBatch(
      Seq(Chg(2L, "insert", 2.0, "A", in_chg = true)).toDF(), dir, 3L)
    assert(state(dir) == Set((1L, 1.0, "A"), (2L, 2.0, "A"), (3L, 3.0, "B")))
  }

  test("crash replay of the same batch id is idempotent through the guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ccw_replay").toString
    StreamingJobs.applyCdcBatch(
      Seq(Chg(1L, "insert", 1.0, "A", in_chg = true)).toDF(), dir, 0L)
    val b1 = Seq(Chg(1L, "update", 10.0, "B", in_chg = true))
    StreamingJobs.applyCdcBatch(b1.toDF(), dir, 1L)
    val before = state(dir)
    StreamingJobs.applyCdcBatch(b1.toDF(), dir, 1L) // at-least-once replay
    assert(state(dir) == before)
    assert(StreamingJobs.listVersions(dir).sorted == Seq(0L, 1L))
  }

  test("the committer marker is written and satisfies vacuum's store check") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ccw_marker").toString
    (0 to 3).foreach { i =>
      StreamingJobs.applyCdcBatch(
        Seq(Chg(i.toLong, "insert", i.toDouble, "A", in_chg = true)).toDF(),
        dir, i.toLong)
    }
    assert(new java.io.File(dir, VersionStore.MarkerName).isFile)
    assert(StreamingJobs.vacuumVersions(dir, keepLast = 2) == Seq(0L, 1L))
  }

  test("listVersions ignores malformed v= names and staging dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ccw_list").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/v=7"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/v=oops"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/_staging_v8_abc"))
    assert(VersionStore.listVersions(dir) == Seq(7L))
  }
}
