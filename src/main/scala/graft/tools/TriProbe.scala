package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage breakdown of the q62 triangle lane. Not benched/verified. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.core.Tables

    def time(label: String)(f: => Long): Unit =
      (0 until 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[tri] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      }

    def edges = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("pks"))
      .select(explode(expr(
        "pair_expand_ids(transform(pks, p -> struct(CAST(p AS BIGINT))))")).as("e"))
      .select(col("e.doc_a").as("a"), col("e.doc_b").as("b"))
      .distinct()

    time("edges")(edges.count())

    def deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    time("deg")(deg.count())

    def rank = deg.select(col("node"), struct(col("deg"), col("node")).as("rk"))
    def oriented = edges
      .join(rank.select(col("node").as("a"), col("rk").as("rka")), Seq("a"))
      .join(rank.select(col("node").as("b"), col("rk").as("rkb")), Seq("b"))
      .select(
        when(col("rka") < col("rkb"), col("a")).otherwise(col("b")).as("u"),
        when(col("rka") < col("rkb"), col("b")).otherwise(col("a")).as("v"))
    time("oriented")(oriented.count())

    def adj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    time("adj")(adj.count())

    def closed = oriented.select(col("u"), col("v"))
      .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(col("u"), col("v"),
        array_intersect(col("nu"), col("nv")).as("ws"))
      .filter(size(col("ws")) > 0)
    time("closed")(closed.count())

    // closing-stage variants over a materialized oriented+adj
    val or2 = oriented.localCheckpoint(true)
    val adj2 = adj.localCheckpoint(true)
    def closedM = or2.select(col("u"), col("v"))
      .join(adj2.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj2.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(col("u"), col("v"),
        array_intersect(col("nu"), col("nv")).as("ws"))
      .filter(size(col("ws")) > 0)
    time("closed_marginal")(closedM.count())
    time("closed_sizeonly")(
      or2.select(col("u"), col("v"))
        .join(adj2.select(col("u"), col("nbrs").as("nu")), Seq("u"))
        .join(adj2.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
        .select(size(array_intersect(col("nu"), col("nv"))).as("k"))
        .agg(sum(col("k"))).count())
    val closed2 = closedM.localCheckpoint(true)
    time("corners_marginal")(
      closed2.select(explode(array(col("u"), col("v"))).as("node"),
          size(col("ws")).cast("long").as("c"))
        .unionAll(closed2.select(explode(col("ws")).as("node"), lit(1L).as("c")))
        .groupBy(col("node")).agg(sum(col("c")).as("tri_cnt")).count())

    time("full")(graft.queries.Entity.q62Triangles(spark, sfDir).count())
    spark.stop()
  }
}
