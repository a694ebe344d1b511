package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (`TESTDATA.md`,
  * `FIXTURES.md` §4). One parquet file per table under the scale-factor dir.
  *
  * Scale posture: these are plain `spark.read.parquet` scans, so Catalyst
  * predicate pushdown / column pruning / partition pruning all apply — at
  * 100 TB the same call reads a partitioned directory tree and prunes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
    * AT BUILD TIME (Bench/Verify/QTime/cli/SparkSpec all do) — a loader
    * must not mutate shared session conf at plan-build time. The long nanos
    * truncate to micros — identical to DuckDB's ns→us truncation, keeping
    * the oracle in lockstep. Integer `div` (not `/`): epoch-nanos exceed
    * 2^53, double math would corrupt the low bits.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Raw-nanos twin of a `ts` predicate bound: predicates on the derived
    * `ts` (timestamp_micros of a div) cannot reach the parquet scan, so
    * range filters should ALSO be expressed on `ts_ns` — Catalyst pushes
    * that one down (PushedFilters) and prunes row groups / partitions.
    * `ts >= T ⟺ ts_ns >= T_micros·1000` under micros truncation. */
  def nanosOf(tsLiteral: String): Long = {
    val inst = java.sql.Timestamp.valueOf(tsLiteral).toInstant
    inst.getEpochSecond * 1000000000L + inst.getNano
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
