package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for selected queries so
  * pushdown / join strategy / codegen spans can be reviewed per round.
  * Usage: runMain graft.Explain [queryName ...] (default: a scale-critical
  * subset).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // SPARK_GRAFT_NO_BROADCAST=1 (the at-scale plan-shape preview) is
    // honored inside GraftSession.builder for every entry point.
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_filter_project", "q07_join_3way", "q08_broadcast_join",
        "q11_hash_agg", "q16_global_topk", "q24_lsh_pairs", "q25_embed_neardup",
        "q25_ivf_topk", "q26_cc_clusters", "q26_semantic_dedup", "q35_pack",
        "q36_scd2", "q33_decontam_bloom", "q37_profile", "q07_outer_join",
        "q14_unpivot", "q29_neardup_batch", "q25_ivf_scale", "q13_hll_merge",
        "q24_lsh_est", "q50_topk_phys", "q51_range_join", "q53_overlap_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
