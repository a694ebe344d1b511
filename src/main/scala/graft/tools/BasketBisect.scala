package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only bisect for the q67 128× heap OOM (r14): times each stage of
  * the lane's plan separately so the failing allocation is attributable —
  * opB build, the basketPairs-derived weighted pair count, and the full
  * lane. Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_scale128 runMain
  * graft.tools.BasketBisect [step…] where step ∈ opb pairs full.
  */
object BasketBisect {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale128")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_BISECT_LOG", "WARN"))
    graft.functions.GraftFunctions.register(spark)
    val steps = if (args.nonEmpty) args.toSeq else Seq("opb", "pairs", "full")
    def t[A](name: String)(body: => A): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[bisect] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs -> $r")
      // drop each step's barriers/caches so steps measure independently
      graft.GraftSession.releaseCaches(spark)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      spark.range(1000).count()
    }
    lazy val op0 = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    steps.foreach {
      case "opb" =>
        t("opB checkpoint + count")(graft.core.Barrier.bounded(op0).count())
      case "pairs" =>
        val opB = graft.core.Barrier.bounded(op0)
        t("basketPairs weighted count") {
          graft.queries.Entity.basketPairs(opB, "ok", "pk")
            .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
            .count()
        }
      case "old" =>
        // the r13 shape, inline: unguarded collect_set + in-place expansion
        val opB = graft.core.Barrier.bounded(op0)
        t("OLD collect_set weighted count") {
          opB.groupBy(col("ok"))
            .agg(collect_set(col("pk")).as("pks"))
            .select(explode(expr(
              "pair_expand_ids(transform(pks, p -> struct(CAST(p AS BIGINT))))")).as("e"))
            .groupBy(col("e.doc_a").as("a"), col("e.doc_b").as("b"))
            .agg(count(lit(1)).as("w"))
            .count()
        }
      case "hk" =>
        val opB = graft.core.Barrier.bounded(op0)
        t("hk count agg alone") {
          opB.groupBy(col("ok")).agg(count(lit(1)).as("f"))
            .filter(col("f") > 256).count()
        }
      case "full" =>
        t("full q67")(graft.SparkEntry.queries("q67_cooccur_sim")(spark, dir).count())
      case "fullold" =>
        // the COMPLETE r13 q67 lane, inline — answers "regression or
        // environment?" for a 128× failure on this box
        t("full OLD q67") {
          val opB = graft.core.Barrier.bounded(op0)
          val nOrd = opB.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
          val pairs0 = opB.groupBy(col("ok"))
            .agg(collect_set(col("pk")).as("pks"))
            .select(explode(expr(
              "pair_expand_ids(transform(pks, p -> struct(CAST(p AS BIGINT))))")).as("e"))
            .groupBy(col("e.doc_a").as("a"), col("e.doc_b").as("b"))
            .agg(count(lit(1)).as("w"))
          val pairs = graft.core.Barrier.bounded(pairs0)
          val sym = pairs.unionAll(
            pairs.select(col("b").as("a"), col("a").as("b"), col("w")))
          val sim = sym
            .join(nOrd.select(col("pk").as("a"), col("cnt").as("na")), Seq("a"))
            .join(nOrd.select(col("pk").as("b"), col("cnt").as("nb")), Seq("b"))
            .select(col("a"), col("b"), col("w"),
              (col("w").cast("double")
                / sqrt((col("na") * col("nb")).cast("double"))).as("sim"))
          graft.plans.GraftPlans.topKPerKey(sim, keys = Seq("a"),
              orderBy = Seq(("sim", false), ("b", true)), k = 3)
            .orderBy(col("a"), col("sim").desc, col("b")).count()
        }
      case other => println(s"[bisect] unknown step $other")
    }
    spark.stop()
  }
}
