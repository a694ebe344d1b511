package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a whole-operator extension needs:
  * wrapping a custom [[LogicalPlan]] node back into a user-facing
  * [[DataFrame]]. `classic.Dataset.ofRows` is package-private to
  * `org.apache.spark.sql`, so this shim lives in a subpackage — the same
  * technique every public Spark extension library uses for its plan-level
  * surface (Sedona's `org.apache.spark.sql.sedona_sql`, Delta's
  * `org.apache.spark.sql.delta`, ...). Nothing else crosses the line:
  * the operator itself (graft.plans.TopKPerKey) is built purely on the
  * public extension points. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
