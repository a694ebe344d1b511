package graft

import org.apache.spark.sql.functions._

/** q58_dataset_hash: the Merkle-bucket snapshot fingerprint. Pins the
  * properties that make it a diff primitive: order/partitioning
  * independence, single-row-edit localization (exactly one bucket row
  * changes), and duplicate-row visibility (the XOR-cancellation hole is
  * closed by count+sum).
  */
class DatasetHashSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is identical across runs and partitionings") {
    val a = graft.queries.Relational3.q58DatasetHash(spark, sf001).collect().map(_.toSeq)
    val b = graft.queries.Relational3.q58DatasetHash(spark, sf001).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }

  test("a single-row edit changes exactly its bucket's row") {
    // replicate the lane's hashing on a copy of customer, flip one name
    def fp(df: org.apache.spark.sql.DataFrame) = df
      .select(expr(graft.queries.TextOps.h60(
        "concat_ws(chr(1), CAST(c_custkey AS STRING), CAST(c_name AS STRING), CAST(c_nationkey AS STRING))"))
        .as("rh"))
      .withColumn("bucket", expr("rh % 256"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rh)").as("x"),
        sum(expr("rh % 2147483648")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val cust = graft.core.Tables.customer(spark, sf001)
      .select($"c_custkey", $"c_name", $"c_nationkey")
    val base = fp(cust)
    val edited = fp(cust.withColumn("c_name",
      when($"c_custkey" === 7, concat($"c_name", lit("-EDITED"))).otherwise($"c_name")))
    val differing = (base.keySet ++ edited.keySet).filter(k => base.get(k) != edited.get(k))
    assert(differing.size <= 2, s"edit must localize (old bucket + new bucket): $differing")
    assert(differing.nonEmpty, "edit must be visible")
  }

  test("fingerprint maintains incrementally: fp(base ∪ δ) = fp(base) ⊕ fp(δ)") {
    // every per-bucket summary is a commutative monoid (count: +, xhash: ⊕,
    // sum31: +), so a CDC stream can maintain the snapshot fingerprint by
    // folding in each micro-batch's delta fingerprint — no base re-scan.
    // Deletes fold in the SAME way (xor is self-inverse, counts/sums
    // subtract). Proven here as the batch algebra the foreachBatch sink
    // would apply.
    def fp(df: org.apache.spark.sql.DataFrame) = df
      .select(expr(graft.queries.TextOps.h60("CAST(id AS STRING)")).as("rh"))
      .groupBy(expr("rh % 256").as("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rh)").as("x"),
        sum(expr("rh % 2147483648")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val base = (1L to 300L).toDF("id")
    val delta = (301L to 400L).toDF("id")
    val whole = fp(base.unionAll(delta))
    val combined = (fp(base).keySet ++ fp(delta).keySet).map { k =>
      val b = fp(base).getOrElse(k, (0L, 0L, 0L))
      val d = fp(delta).getOrElse(k, (0L, 0L, 0L))
      k -> ((b._1 + d._1, b._2 ^ d._2, b._3 + d._3))
    }.toMap
    assert(whole === combined)
  }

  test("q61 pruned diff recovers exactly the hash-chosen edits, both sides") {
    // sf0.01 for a non-trivial edit set (62 hash-chosen keys)
    val sf01 = "/root/testdata/sf0.01"
    val out = graft.queries.Relational3.q61SnapshotDiff(spark, sf01)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    val edited = graft.core.Tables.customer(spark, sf01)
      .filter(expr(s"${graft.queries.TextOps.h60("CAST(c_custkey AS STRING)")} % 20 = 7"))
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    assert(edited.nonEmpty)
    assert(out.filter(_._2 == "removed").map(_._1).toSet === edited)
    assert(out.filter(_._2 == "added").map(_._1).toSet === edited)
    // pruning really prunes: changed buckets ≤ edits (each edit moves ≤ 2)
    val buckets = graft.queries.Relational3.q61SnapshotDiff(spark, sf01)
      .select(col("bucket")).distinct().count()
    assert(buckets <= 2L * edited.size && buckets < 256)
  }

  test("duplicating a row is visible despite XOR cancellation being possible") {
    def fp(df: org.apache.spark.sql.DataFrame) = df
      .select(expr(graft.queries.TextOps.h60("CAST(id AS STRING)")).as("rh"))
      .groupBy(expr("rh % 256").as("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rh)").as("x"),
        sum(expr("rh % 2147483648")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ids = (1L to 100L).toDF("id")
    val doubled = ids.unionAll((1L to 2L).toDF("id"))
    val a = fp(ids); val b = fp(doubled)
    // xor of a duplicated pair cancels, but count and sum both move
    assert(a !== b)
  }
}
