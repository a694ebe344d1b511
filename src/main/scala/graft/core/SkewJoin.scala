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

  /** Self-PAIR expansion for viral bucket keys with per-key 2-D GRID
    * salting — the shape 1-D salting cannot bound: salting one side into
    * a fixed `buckets` leaves each task joining f/buckets × f rows, so
    * per-task output still grows LINEARLY with the key's row count f
    * (measured at 128× twins: a 70 k-row band bucket ⇒ ~150 M-pair tasks).
    * Here both sides split into B = ⌈f/cap⌉ hash slices and the pair space
    * becomes a B×B grid of cells: row x lands in column h(x) replicated
    * across rows, row y in row h(y) replicated across columns, so every
    * ordered pair (x, y) meets in EXACTLY ONE cell (h(x), h(y)) — no
    * dedup pass — and per-cell work is ~cap² pairs REGARDLESS of f. B is
    * per-key (derived from `fCol`, which the capped-collect aggregation
    * already computed), so moderate hot keys pay a 2-3× explode while a
    * viral key fans exactly as wide as its quadratic output requires:
    * replicated rows per key = f·B ≈ f²/cap = 2·pairs/cap — O(1) overhead
    * per emitted pair. Returns `carry` columns (from the x side) plus
    * payload pair (`x`, `y`); the caller applies its own dedup/order
    * filter (e.g. x.doc_id < y.doc_id).
    */
  def gridSelfPairs(rows: DataFrame, key: String, fCol: String,
                    payloadCol: String, carry: Seq[String],
                    cap: Int): DataFrame = {
    require(cap > 0)
    val withB = rows.withColumn("_gb",
      greatest(lit(1), ceil(col(fCol).cast("double") / cap).cast("int")))
    val l = withB
      .withColumn("_gi", pmod(hash(col(payloadCol)), col("_gb")))
      .withColumn("_gj", explode(expr("sequence(0, _gb - 1)")))
      .select(Seq(col(key), col("_gi"), col("_gj")) ++
        carry.map(col) :+ col(payloadCol).as("x"): _*)
    val r = withB
      .withColumn("_gj", pmod(hash(col(payloadCol)), col("_gb")))
      .withColumn("_gi", explode(expr("sequence(0, _gb - 1)")))
      .select(col(key), col("_gi"), col("_gj"), col(payloadCol).as("y"))
    l.join(r, Seq(key, "_gi", "_gj")).drop("_gi", "_gj")
  }
}
