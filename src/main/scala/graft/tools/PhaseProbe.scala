package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only micro-breakdown of the SimHash pair lane: times each pipeline
  * stage in isolation (2 reps, second ≈ warm) so perf work targets the
  * stage that actually dominates instead of the one that looks guilty.
  * Not part of the benched/verified surface.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    graft.functions.GraftFunctions.register(spark)
    import graft.core.Tables

    def time(label: String)(f: => Long): Unit =
      (0 until 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[phase] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      }

    val h60 = (c: String) =>
      s"CAST(conv(substring(md5($c), 1, 15), 16, 10) AS BIGINT)"

    time("scan_only")(Tables.documents(spark, sfDir).filter(col("text").isNotNull).count())
    time("tok_hash")(Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .withColumn("th", expr(s"transform(split(text, ' '), t -> ${h60("t")})"))
      .select(sum(size(col("th")))).count())
    time("simhash")(Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .withColumn("th", expr(s"transform(split(text, ' '), t -> ${h60("t")})"))
      .select(col("doc_id"), expr("simhash60(th)").as("simhash")).count())
    def bandsDf = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .withColumn("th", expr(s"transform(split(text, ' '), t -> ${h60("t")})"))
      .select(col("doc_id"), expr("simhash60(th)").as("simhash"))
      .withColumn("band_id", explode(expr("sequence(0, 4)")))
      .withColumn("bk", expr("shiftright(simhash, 12 * band_id) & 4095"))
      .select(col("band_id"), col("bk"), struct(col("doc_id"), col("simhash")).as("e"))
    time("bands_count")(bandsDf.count())
    time("bands_ckpt") { val c = bandsDf.localCheckpoint(); c.count() }
    val ck = bandsDf.localCheckpoint()
    time("hotkey_agg_isEmpty") {
      val hk = ck.groupBy(col("band_id"), col("bk")).agg(count(lit(1)).as("f"))
        .filter(col("f") > 256).select(col("band_id"), col("bk"))
      if (hk.isEmpty) 0L else 1L
    }
    time("cold_group_pairs")(ck
      .groupBy(col("band_id"), col("bk")).agg(collect_list(col("e")).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr("pair_expand_ids(ds)")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.hamming"))
      .distinct().filter(col("hamming") <= 4).count())
    time("cold_only")(bandsDf
      .groupBy(col("band_id"), col("bk")).agg(expr("collect_capped(e, 256)").as("g"))
      .filter(col("g.f") <= 256 && size(col("g.ds")) > 1)
      .select(explode(expr("pair_expand_ids(g.ds)")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.hamming"))
      .distinct().filter(col("hamming") <= 4).count())
    time("full_lane")(graft.SparkEntry.queries("q24_simhash_pairs")(spark, sfDir).count())
    time("full_survivors")(graft.SparkEntry.queries("q26_dedup_survivors")(spark, sfDir).count())
    spark.stop()
  }
}
