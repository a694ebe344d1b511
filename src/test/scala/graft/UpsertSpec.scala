package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational3

/** Property coverage for the q45 MERGE-shape upsert: applying a change
  * feed is a FIXPOINT (re-application changes nothing) and the merged
  * result diffs clean against the target snapshot it was derived from. */
class UpsertSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Option[Double], String)] =
    df.select(col("o_orderkey"), col("price"), col("status"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getString(2)))
      .toSet

  test("q45_upsert: applying the change feed twice is the same as once") {
    val dir = "/root/testdata/sf0.01"
    val once = Relational3.q45Upsert(spark, dir)
    // feed the merged result back through the SAME change feed
    val o = graft.core.Tables.orders(spark, dir)
    val twice = Relational3.applyChanges(
      once.select(col("o_orderkey"), col("price"), col("status")),
      Relational3.changeFeedFor(o))
    assert(canon(twice) === canon(once), "re-application must be a no-op")
  }

  test("q45_upsert: merge(old, diff(old->new)) reproduces the new snapshot exactly") {
    val dir = "/root/testdata/sf0.01"
    val o = graft.core.Tables.orders(spark, dir)
    val merged = canon(Relational3.q45Upsert(spark, dir))
    val neu = o.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 1.1)
          .otherwise(col("o_totalprice")).cast("double").as("price"),
        col("o_orderstatus").as("status"))
    assert(merged === canon(neu))
  }

  test("q45_upsert: deletes of absent keys and repeated inserts stay idempotent on a cold target") {
    import spark.implicits._
    // hand-built micro-case: target {1,2}; changes: update 1, delete 2,
    // insert 3, delete 99 (absent)
    val target = Seq((1L, Some(10.0), "O"), (2L, Some(20.0), "F"))
      .toDF("o_orderkey", "price", "status")
    val changes = Seq(
      (1L, "update", Some(11.0), "O", true),
      (2L, "delete", None: Option[Double], "F", true),
      (3L, "insert", Some(30.0), "P", true),
      (99L, "delete", None: Option[Double], "X", true))
      .toDF("o_orderkey", "verdict", "new_price", "new_status", "in_chg")
    val once = Relational3.applyChanges(target, changes)
    assert(canon(once) === Set(
      (1L, Some(11.0), "O"), (3L, Some(30.0), "P")))
    val twice = Relational3.applyChanges(
      once.select(col("o_orderkey"), col("price"), col("status")), changes)
    assert(canon(twice) === canon(once))
  }
}
