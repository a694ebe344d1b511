package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual escape hatch when AQE's
  * runtime skew splitting (`spark.sql.adaptive.skewJoin`) can't help:
  * e.g. one tenant/domain holding half the rows of a 100 TB fact table
  * (the reference's multi-domain layout, R12, makes per-domain skew the
  * expected failure mode).
  *
  * Left (skewed, large) rows get a random-but-deterministic salt in
  * [0, buckets); the right (smaller) side is exploded `buckets`× so every
  * (key, salt) combination exists. The join key becomes (key, salt), so a
  * hot key's rows spread over `buckets` shuffle partitions instead of one.
  * Row-count semantics are identical to the plain equi-join.
  *
  * Salt is `pmod(hash(col, monotonically_increasing_id-free row identity
  * columns), buckets)` — deterministic given the salt columns, so re-runs
  * produce identical partitioning (no RNG; same discipline as the rest of
  * the engine).
  */
object SkewJoin {
  /** Inner equi-join `left.key == right.key` with the left side salted.
    * `saltBy` must be columns of `left` that (together) vary within a hot
    * key — any per-row attribute works; uniqueness is not required. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      buckets: Int, saltBy: Seq[String]): DataFrame = {
    require(buckets > 0)
    val l = left.withColumn("_salt",
      pmod(hash(saltBy.map(col): _*), lit(buckets)))
    val r = right
      .withColumn("_salt", explode(expr(s"sequence(0, ${buckets - 1})")))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
