package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only stage breakdown of q93_containment_full — the slowest noop lane
  * in both r14 bench windows (5.5 s clean / 10 s driver). Times the lane's
  * pipeline cut at each stage boundary (2 reps, second ≈ warm; `keyed`
  * persisted once exactly as the lane does) so the r15 perf work targets
  * the stage that actually dominates: twin-collapse window vs df groupBy
  * vs prefix rank window vs candidate join vs verify join vs expansion.
  * Not part of the benched/verified surface.
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    graft.functions.GraftFunctions.register(spark)
    import graft.queries.Similarity

    def time(label: String)(f: => Long): Unit =
      (0 until 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[contain] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      }

    val d = Similarity.docsWithShingles(spark, sfDir)
    time("s1_shingles")(d.count())

    // the lane's twin-collapse block, verbatim shape
    val byHash = Window.partitionBy(col("n"), col("kh")).orderBy(col("doc_id"))
    val bySet = Window.partitionBy(col("n"), col("kh"), array_sort(col("sh")))
    def keyedDf = d
      .select(col("doc_id"), size(col("sh")).as("n"), col("sh"))
      .withColumn("kh", xxhash64(array_sort(col("sh"))))
      .withColumn("rep_id0", first(col("doc_id")).over(byHash))
      .withColumn("rep_sh", first(col("sh")).over(byHash))
      .withColumn("rep_id",
        when(array_sort(col("sh")) === array_sort(col("rep_sh")),
          col("rep_id0"))
          .otherwise(min(col("doc_id")).over(bySet)))
      .select(col("doc_id"), col("n"), col("sh"), col("rep_id"))
    time("s2_twin_collapse")(keyedDf.count())

    val keyed = keyedDf.persist()
    keyed.count() // materialize once, as the lane does
    val reps = keyed.filter(col("doc_id") === col("rep_id"))
      .select(col("rep_id"), col("n"), col("sh"))
    val members = keyed.select(col("rep_id"), col("doc_id"))

    val post = reps.select(col("rep_id"), col("n"), explode(col("sh")).as("s"))
      .select(col("rep_id"), col("n"), xxhash64(col("s")).as("hs"))
    time("s3_postings")(post.count())
    val dfreq = post.groupBy(col("hs")).agg(count(lit(1)).as("df"))
    time("s4_dfreq")(dfreq.count())
    time("s5_post_join_dfreq")(post.join(dfreq, "hs").count())
    def ordered = post.join(dfreq, "hs")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("rep_id"))
          .orderBy(col("df"), col("hs"))))
    time("s6_prefix_rank")(ordered.count())
    def pref = ordered.filter(col("rn") <= col("n") - expr("(7*n+9) div 10") + lit(1))
      .select(col("hs"), col("rep_id").as("rep_small"), col("n").as("n_small"))
    def cand = pref
      .join(post.select(col("hs"), col("rep_id").as("rep_large"), col("n").as("n_large")), "hs")
      .filter(col("n_small") < col("n_large") ||
        (col("n_small") === col("n_large") && col("rep_small") < col("rep_large")))
      .select(col("rep_small"), col("rep_large"))
      .distinct()
    time("s7_candidates")(cand.count())
    def verified = cand
      .join(reps.select(col("rep_id").as("rep_small"), col("sh").as("sh_a")), "rep_small")
      .join(reps.select(col("rep_id").as("rep_large"), col("sh").as("sh_b"),
        col("n").as("n_large")), "rep_large")
      .withColumn("isz", size(array_intersect(col("sh_a"), col("sh_b"))))
      .filter(lit(10) * col("isz") >= lit(7) * size(col("sh_a")))
    time("s8_verify")(verified.count())
    keyed.unpersist()

    time("s9_full_lane")(graft.SparkEntry.queries("q93_containment_full")(spark, sfDir).count())
    spark.stop()
  }
}
