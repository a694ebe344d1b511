package graft

import scala.jdk.CollectionConverters._
import graft.queries.Relational3

/** q39_bloom_skip's claim, proven from the written parquet metadata: the
  * hash-scattered layout's row-group [min,max] stats on event_id span every
  * probe (stats prune NOTHING), while the embedded bloom filters report
  * "definitely absent" for values not in the file — the skip decision a
  * probing scan makes at footer-read time, evaluated here directly against
  * the same sketches.
  */
class BloomSkipSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  /** Per row group: (min, max, bloom-might-contain fn) for event_id. */
  private def rowGroupProbes(dir: String): Seq[(Long, Long, Long => Boolean)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        // the reader must stay open only while we use the bloom reader, so
        // evaluate the probes eagerly per block and close before returning
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == "event_id")
            .getOrElse(fail(s"no event_id chunk in ${f.getName}"))
          val st = c.getStatistics
          val bloom = r.getBloomFilterDataReader(b).readBloomFilter(c)
          assert(bloom != null, s"no bloom filter written in ${f.getName}")
          val probe = (v: Long) => bloom.findHash(bloom.hash(v))
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue,
            probe)
        }
        finally r.close()
      }
  }

  test("bloom filters skip absent point probes; min/max stats cannot") {
    val dir = Relational3.bloomSlot(spark, sf01)
    val groups = rowGroupProbes(dir)
    assert(groups.size >= 8, s"expected >=8 row groups, got ${groups.size}")

    // sf0.01 has event_id 0..9999, minus the slot's %997 tombstones —
    // 997/1994/3988 are IN-RANGE ids that are definitely not in the file,
    // the case min/max stats cannot serve
    val present = Seq(11L, 47L, 911L)     // the lane's probes
    val absent = Seq(997L, 1994L, 3988L)

    // 1. stats are (near-)useless here: the hash-scattered layout leaves
    //    most row groups spanning any given probe — for the mid-range ids
    //    ALL of them. (The smallest probe can fall below a random group's
    //    min, so assert all-groups only where the order statistics make it
    //    certain, and a strong majority overall.)
    (present ++ absent).foreach { v =>
      val n = groups.count { case (mn, mx, _) => mn <= v && v <= mx }
      val need = if (v >= 900) groups.size else groups.size / 2
      assert(n >= need, s"stats excluded $v in ${groups.size - n} groups — " +
        "scatter assumption broken")
    }

    // 2. no false negatives: each present id might-contain in at least one
    //    row group (it IS in exactly one)
    present.foreach { v =>
      assert(groups.exists(_._3(v)), s"bloom false negative for present $v")
    }

    // 3. the skip: absent probes are definitely-absent in EVERY row group
    //    (bloom FP rate at ndv-hint sizing makes a hit vanishingly rare;
    //    any flake here means the sketch is mis-sized, which we want to see)
    absent.foreach { v =>
      val hits = groups.count(_._3(v))
      assert(hits == 0,
        s"absent $v might-contain in $hits/${groups.size} row groups")
    }
  }

  test("lane fidelity: probe over the bloom rewrite equals the raw rows") {
    val got = Relational3.q39BloomSkip(spark, sf01)
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val raw = graft.core.Tables.events(spark, sf01)
      .filter(org.apache.spark.sql.functions.col("event_id")
        .isin(11L, 47L, 911L))
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got.sorted === raw)
    assert(got.nonEmpty)
  }
}
