package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingJobs

/** Streaming MERGE (StreamingJobs.cdcApply): a CDC change stream applied
  * micro-batch by micro-batch must land exactly where the BATCH merge
  * operator lands when folding the same batches — one applyChanges
  * definition, two drivers. Plus the two properties a crash-and-restart
  * leans on: replaying a delivered batch rewrites its own version
  * identically (idempotence), and every committed version remains
  * readable (time travel).
  */
final case class Chg(o_orderkey: Long, verdict: String,
                     new_price: Double, new_status: String, in_chg: Boolean)

class StreamUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val b0 = (1L to 10L).map(k => Chg(k, "insert", k * 1.0, "A", in_chg = true))
  private val b1 = Seq(
    Chg(2L, "update", 20.0, "B", in_chg = true),
    Chg(4L, "update", 40.0, "B", in_chg = true),
    Chg(3L, "delete", 0.0, "A", in_chg = true))
  private val b2 = Seq(
    Chg(2L, "update", 200.0, "C", in_chg = true),
    Chg(11L, "insert", 11.0, "A", in_chg = true))

  private def targetState(dir: String, v: Long) =
    spark.read.parquet(s"$dir/v=$v")
      .select(col("o_orderkey"), col("price"), col("status"))

  test("streamed CDC apply equals the batch fold of the same micro-batches") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ck").toString
    val src = MemoryStream[Chg]
    val q = StreamingJobs.cdcApply(src.toDF(), dir)
      .option("checkpointLocation", ckpt).start()
    try {
      for (b <- Seq(b0, b1, b2)) {
        src.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val versions = StreamingJobs.listVersions(dir).sorted
    assert(versions === Seq(0L, 1L, 2L), s"got versions $versions")

    // batch fold of the identical batches through the same operator
    var folded = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      targetState(dir, 0).schema)
    for (b <- Seq(b0, b1, b2))
      folded = graft.queries.Relational3.applyChanges(folded, b.toDF())
    val streamed = targetState(dir, versions.last)
    assert(streamed.exceptAll(folded).count() == 0 &&
      folded.exceptAll(streamed).count() == 0)

    // spot-pin the semantics: 3 deleted, 2 re-updated, 11 inserted late
    val m = streamed.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(!m.contains(3L))
    assert(m(2L) === ((200.0, "C")))
    assert(m(4L) === ((40.0, "B")))
    assert(m(11L) === ((11.0, "A")))
    assert(m(1L) === ((1.0, "A")))
    assert(m.size == 10)
  }

  test("replaying a delivered batch rewrites its version identically (at-least-once safety)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_rp").toString
    StreamingJobs.applyCdcBatch(b0.toDF(), dir, 0L)
    StreamingJobs.applyCdcBatch(b1.toDF(), dir, 1L)
    val before = targetState(dir, 1L).collect().toSet
    // the re-delivery a crashed-then-restarted query produces: same batch
    // id, same rows — must re-read base v=0 and overwrite v=1 to the
    // identical state, not double-apply
    StreamingJobs.applyCdcBatch(b1.toDF(), dir, 1L)
    assert(targetState(dir, 1L).collect().toSet === before)
    // earlier versions stay readable (time travel): v=0 still has key 3
    assert(targetState(dir, 0L).filter(col("o_orderkey") === 3L).count() == 1)
  }

  test("a torn version write from a crashed attempt is healed by the replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_torn").toString
    StreamingJobs.applyCdcBatch(b0.toDF(), dir, 0L)
    StreamingJobs.applyCdcBatch(b1.toDF(), dir, 1L)
    val good = targetState(dir, 1L).collect().toSet
    // simulate the crash shape the version protocol defends against: the
    // first delivery of batch 1 died mid-write, leaving v=1 present but
    // PARTIAL (here: a stale 2-row subset posing as the version)
    targetState(dir, 0L).limit(2)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/v=1")
    assert(targetState(dir, 1L).count() == 2) // torn state really landed
    // the at-least-once re-delivery: base is re-derived from v=0 (versions
    // below the batch id), so the torn v=1 is overwritten, never read
    StreamingJobs.applyCdcBatch(b1.toDF(), dir, 1L)
    assert(targetState(dir, 1L).collect().toSet === good)
  }
}
