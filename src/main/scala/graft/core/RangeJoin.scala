package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scalable plan for the join Spark has no native
  * strategy for: an INEQUALITY-ONLY predicate (point ∈ [start, end), or
  * interval overlap) with no equi-key. Stock Catalyst plans that as
  * BroadcastNestedLoopJoin (every point × every interval — quadratic, and
  * an OOM once the interval side outgrows the broadcast threshold), which
  * is exactly the shape the engine's no-broadcast audit hunts down.
  *
  * The standard fix (Databricks' range-join hint, the genomics
  * interval-join literature): quantize the range dimension into
  * fixed-width bins, equi-join on the bin, re-check the exact predicate
  * as a residual filter.
  *
  *  - each INTERVAL row is exploded to every bin it touches
  *    (`sequence(floor(start/w), floor((end-1)/w))` — cost: interval side
  *    inflated by ~avg-span/w; pick w near the typical span so the
  *    inflation is a small constant);
  *  - each POINT row gets its single bin `floor(pt/w)`;
  *  - the join is a plain shuffled equi-join on the bin — partitioned,
  *    AQE-planned, skew-splittable like any other — and because
  *    `start ≤ pt < end` forces `floor(start/w) ≤ floor(pt/w) ≤
  *    floor((end-1)/w)`, every qualifying (point, interval) pair meets in
  *    EXACTLY the point's bin: no duplicates, no post-join dedup.
  *
  * At 100 TB: shuffle volume is points + inflated intervals (linear),
  * never points × intervals; a hot bin (an incident window over a traffic
  * spike — by construction the busy region) is an ordinary skewed
  * equi-join key, handled by AQE skew split or `SkewJoin.saltedInnerJoin`
  * on the bin column like every other hot key in the engine.
  *
  * Columns must be integral (caller quantizes: `unix_micros` for
  * timestamps — exact int64, no float seconds). Half-open [start, end).
  */
object RangeJoin {

  /** Join `points` to every `intervals` row with
    * `points(pointCol) ∈ [intervals(startCol), intervals(endCol))`.
    * Output columns = point columns ++ interval columns (names must be
    * disjoint). `binWidth` is in the column's units and must be > 0. */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint, both have: $overlap")

    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val pb = points.withColumn("__graft_pbin", bin(col(pointCol)))
    // Empty/reversed intervals ([s, e) with s >= e) can match nothing, but
    // Spark's sequence(a, b) DESCENDS when a > b — drop them up front
    // rather than explode spurious bins the residual would discard.
    val ib = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__graft_ibin",
        explode(sequence(bin(col(startCol)), bin(col(endCol) - lit(1L)))))
    pb.join(ib,
        pb("__graft_pbin") === ib("__graft_ibin") &&
          col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__graft_pbin", "__graft_ibin")
  }

  /** Join every `left` interval `[lStart, lEnd)` to every `right` interval
    * `[rStart, rEnd)` they OVERLAP (`lStart < rEnd && rStart < lEnd`) —
    * the genomics/session-attribution shape. Both sides explode to their
    * touched bins, but a pair sharing many bins must still match ONCE:
    * the join takes a pair only in its OWNERSHIP bin, the bin of
    * `greatest(lStart, rStart)` (the overlap's first instant), which both
    * sides provably touch — `floor` is monotone, and overlap bounds
    * `max(lStart, rStart) ≤ min(lEnd, rEnd) - 1` put that bin inside both
    * bin ranges. No dedup pass, exactly like the point form.
    *
    * Cost note: each side inflates by ~avg-span/w. UNBOUNDED intervals
    * (open-ended validity, `valid_to IS NULL`) must be CLAMPED by the
    * caller to the data's horizon before binning — an open end explodes
    * to every bin to infinity. Clamping to (max end of the other side)
    * never changes the overlap verdict. */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"left/right column names must be disjoint, both have: $overlapCols")

    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    def binned(df: DataFrame, s: String, e: String, out: String): DataFrame =
      df.filter(col(s) < col(e))
        .withColumn(out, explode(sequence(bin(col(s)), bin(col(e) - lit(1L)))))
    val lb = binned(left, lStart, lEnd, "__graft_lbin")
    val rb = binned(right, rStart, rEnd, "__graft_rbin")
    lb.join(rb,
        lb("__graft_lbin") === rb("__graft_rbin") &&
          lb("__graft_lbin") === bin(greatest(col(lStart), col(rStart))) &&
          col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .drop("__graft_lbin", "__graft_rbin")
  }
}
