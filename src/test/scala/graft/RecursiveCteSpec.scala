package graft

import org.apache.spark.sql.functions._

/** q60_recursive_cte: Spark 4's WITH RECURSIVE on the digit-category
  * hierarchy. Laws: every row satisfies anc = p_partkey DIV 10^depth, the
  * chain terminates exactly at the sub-10 root, and row count = Σ digit
  * counts.
  */
class RecursiveCteSpec extends SparkSpec {

  private lazy val out = graft.queries.Relational3.q60RecursiveCte(spark, sf001)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))

  test("each row is the depth-th ancestor: anc = key DIV 10^depth") {
    assert(out.nonEmpty)
    assert(out.forall { case (k, a, d, _) =>
      a == k / math.pow(10, d).toLong
    })
  }

  test("chains run exactly to the sub-10 root; path tracks the chain") {
    val byKey = out.groupBy(_._1)
    assert(byKey.forall { case (k, rows) =>
      val maxD = rows.map(_._3).max
      val root = rows.find(_._3 == maxD).get._2
      root < 10 && rows.length == maxD + 1 &&
        rows.forall { case (k2, a, d, p) =>
          // path runs from the depth-d ancestor down to the key itself
          val segs = p.split("/")
          segs.length == d + 1 && segs.head == a.toString && segs.last == k2.toString
        }
    })
  }

  test("row count is Σ digit-counts over all parts") {
    val nParts = graft.core.Tables.part(spark, sf001).count()
    val expected = graft.core.Tables.part(spark, sf001)
      .agg(sum(length(col("p_partkey").cast("string")))).head.getLong(0)
    assert(out.length.toLong === expected)
    assert(out.count(_._3 == 0).toLong === nParts)
  }
}
