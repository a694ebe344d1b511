package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The codegen'd simhash60 Expression must be bit-identical to the
  * 60-sum-column aggregation formulation it replaced — four lanes
  * (simhash_pairs, dedup_survivors, cc_clusters, quality_survivors) and
  * their DuckDB oracles assume ONE simhash definition. */
class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  test("simhash60 equals the aggregation formulation on the sf0.001 corpus") {
    val viaExpr = graft.SparkEntry.queries // force object init
    val agg = graft.queries.Similarity.simhashesAgg(spark, sf001)
      .as[(Long, Long)].collect().toMap
    GraftFunctions.register(spark)
    val fast = graft.core.Tables.documents(spark, sf001)
      .withColumn("th", expr(
        "transform(split(text, ' '), t -> CAST(conv(substr(md5(t),1,15),16,10) AS BIGINT))"))
      .select($"doc_id", expr("simhash60(th)").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(fast.size === agg.size)
    agg.foreach { case (id, s) => assert(fast(id) === s, s"doc $id") }
  }

  test("interpreted path agrees with codegen; empty array -> 0; null propagates") {
    GraftFunctions.register(spark)
    val rows = Seq(Seq(1L, 2L, 3L), Seq((1L << 59) | 1L), Seq.empty[Long])
    def run(): Seq[Long] =
      rows.toDF("th").select(expr("simhash60(th)")).as[Long].collect().toSeq
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() === viaCodegen)
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(viaCodegen(2) === 0L)
    val n = Seq(Tuple1(null: Seq[Long])).toDF("th")
      .select(expr("simhash60(th)").isNull).as[Boolean].head()
    assert(n)
  }
}
