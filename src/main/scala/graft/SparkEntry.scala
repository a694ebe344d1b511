package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared query surface (SURVEY.md §2B); each
  * entry takes (session, scale-factor dir) and returns a deterministic,
  * totally-ordered DataFrame. `oracleSql` carries the DuckDB-equivalent SQL
  * for hash-compare; keys without an oracle get a rows-only check
  * (approximate or non-SQL-expressible ops).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q11(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ Relational2.defs ++ Relational3.defs ++ TextOps.defs ++
      Similarity.defs ++ Multimodal.defs ++ Windowed.defs ++ Sampling.defs ++
      Analytics.defs ++ Entity.defs ++ Curate.defs ++ Evaluation.defs

  def oracleSql: Map[String, String] =
    Relational.oracle ++ Relational2.oracle ++ Relational3.oracle ++ TextOps.oracle ++
      Similarity.oracle ++ Multimodal.oracle ++ Windowed.oracle ++ Sampling.oracle ++
      Analytics.oracle ++ Entity.oracle ++ Curate.oracle ++ Evaluation.oracle
}
