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
    val builder = GraftSession.builder("4")
    // SPARK_GRAFT_NO_BROADCAST=1: preview the at-scale plan shape — with
    // test-SF inputs every join side fits under the broadcast threshold,
    // which hides the SMJ/shuffle structure a 100 TB run would use.
    if (sys.env.get("SPARK_GRAFT_NO_BROADCAST").contains("1"))
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_filter_project", "q07_join_3way", "q08_broadcast_join",
        "q11_hash_agg", "q16_global_topk", "q24_lsh_pairs", "q25_embed_neardup",
        "q25_ivf_topk", "q26_cc_clusters", "q26_semantic_dedup", "q35_pack",
        "q36_scd2", "q33_decontam_bloom", "q37_profile", "q07_outer_join",
        "q14_unpivot", "q29_neardup_batch", "q25_ivf_scale", "q13_hll_merge",
        "q24_lsh_est")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
