package graft

import org.apache.spark.sql.functions._
import graft.queries.Multimodal
import graft.functions.BatchSizeAgg

/** Specs for the multimodal batched-decode path and the typed Aggregator. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions batched decode agrees with the SQL decode stub") {
    val batched = Multimodal.decodeBatched(spark, sf001)
      .select($"doc_id", $"n_bytes", $"format", $"width", $"height")
    val sql = Multimodal.q32MediaMeta(spark, sf001)
      .select($"doc_id", $"n_bytes", $"format", $"width", $"height")
    assert(batched.except(sql).count() === 0)
    assert(sql.except(batched).count() === 0)
    assert(batched.count() === 500)
  }

  test("BatchSizeAgg: one-pass stats match groupBy aggregates; limit suggestion bounded") {
    val bytes = Seq(100L, 200L, 300L, 150L, 250L)
    val ds = bytes.toDS()
    val stats = ds.select(BatchSizeAgg.agg.toColumn).head()
    assert(stats.count === 5)
    assert(stats.totalBytes === bytes.sum)
    assert(stats.maxBytes === 300L)
    assert(stats.avgBytes === bytes.sum.toDouble / 5)
    assert(stats.suggestedLimit > 0 && stats.suggestedLimit <= 10000)
  }

  test("BatchSizeAgg distributes: partial+final merge equals single-partition result") {
    val bytes = (1L to 1000L).toDS()
    val many = bytes.repartition(8).select(BatchSizeAgg.agg.toColumn).head()
    val one = bytes.coalesce(1).select(BatchSizeAgg.agg.toColumn).head()
    assert(many === one)
  }
}
