package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics

/** q48_incr_agg's license: merging per-slice partial aggregates equals the
  * from-scratch aggregate for EVERY slice topology — the identity that
  * makes incremental materialized-view refresh sound. The lane exercises
  * one split (history | tail); this spec exercises adversarial ones:
  * unaligned time splits (slices cutting through a day), a per-day
  * micro-batch stream of deltas folded in one at a time (the nightly
  * refresh loop), and a hash split that scatters every day's rows across
  * all slices. Σv is an exact decimal sum, so equality is bit-exact —
  * no tolerance anywhere.
  */
class IncrAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def events = graft.core.Tables.events(spark, dir)

  private def full = Analytics.finalizeView(
    Analytics.mergePartials(Analytics.dailyPartials(events)))

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val d1 = a.exceptAll(b).count()
    val d2 = b.exceptAll(a).count()
    assert(d1 == 0 && d2 == 0, s"$tag: exceptAll counts $d1/$d2")
  }

  test("merge over unaligned time slices equals the full aggregate") {
    val cuts = Seq("2024-01-05 07:13:00", "2024-01-11 23:59:59", "2024-01-19 12:00:00")
    val bounds = ("2000-01-01 00:00:00" +: cuts) :+ "2100-01-01 00:00:00"
    val slices = bounds.sliding(2).map { case Seq(lo, hi) =>
      Analytics.dailyPartials(graft.core.Tables.eventsRanged(spark, dir, lo, hi))
    }.toSeq
    val merged = Analytics.finalizeView(
      Analytics.mergePartials(slices.reduce(_ unionByName _)))
    assertSame(merged, full, "unaligned-time")
  }

  test("folding per-day deltas one at a time reaches the full aggregate (refresh loop)") {
    val days = events.select(to_date(col("ts")).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.length > 5, s"expected many days, got ${days.length}")
    var state = Analytics.dailyPartials(
      graft.core.Tables.eventsRanged(spark, dir, "2000-01-01 00:00:00", s"${days.head} 00:00:00"))
    for (d <- days) {
      val next = java.time.LocalDate.parse(d).plusDays(1).toString
      val delta = Analytics.dailyPartials(graft.core.Tables.eventsRanged(
        spark, dir, s"$d 00:00:00", s"$next 00:00:00"))
      // localCheckpoint models the nightly write of the MV state table (and
      // keeps the 30-refresh test from building a 30-deep nested-agg plan).
      state = Analytics.mergePartials(state.unionByName(delta)).localCheckpoint()
    }
    assertSame(Analytics.finalizeView(state), full, "per-day-fold")
  }

  test("hash-scattered slices (every day split across all slices) merge exactly") {
    val slices = (0 until 4).map { i =>
      Analytics.dailyPartials(events.filter(pmod(col("event_id"), lit(4)) === i))
    }
    val merged = Analytics.finalizeView(
      Analytics.mergePartials(slices.reduce(_ unionByName _)))
    assertSame(merged, full, "hash-scatter")
  }

  test("q48 lane smoke: one state|delta refresh, n sums to the corpus size") {
    val out = Analytics.q48IncrAgg(spark, dir)
    val total = out.agg(sum(col("n"))).head().getLong(0)
    assert(total == events.count(), s"view rows cover $total of ${events.count()}")
    assert(out.columns.toSeq ==
      Seq("event_type", "day", "n", "sum_v", "avg_v", "min_v", "max_v"))
  }
}
