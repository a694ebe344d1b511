package graft

import org.apache.spark.sql.functions._

/** Catalog-managed tables — the other half of the SQL-first surface:
  * `openSql` registers temp views (session-lifetime), while saveAsTable
  * persists a table INTO the session catalog so `spark.table`/SQL and
  * later appends resolve it by name, no paths in user code. On a real
  * deployment the same calls target a shared metastore; the scan under a
  * catalog table is the identical parquet relation (pushdown, pruning and
  * statistics all still apply — the catalog only owns naming + schema).
  */
class CatalogTableSpec extends SparkSpec {
  import spark.implicits._

  test("saveAsTable persists into the catalog; SQL and appends resolve by name") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", $"lang", $"n_chars")
    try {
      docs.write.mode("overwrite").saveAsTable("graft_docs_cat")
      assert(spark.catalog.tableExists("graft_docs_cat"))
      val viaSql = spark.sql(
        "SELECT count(*) AS n, sum(n_chars) AS c FROM graft_docs_cat")
        .as[(Long, Long)].head()
      val direct = docs.agg(count(lit(1)), sum($"n_chars")).as[(Long, Long)].head()
      assert(viaSql === direct)
      // append by NAME — the write path a pipeline stage uses when it only
      // knows the logical table
      docs.limit(10).write.mode("append").saveAsTable("graft_docs_cat")
      assert(spark.table("graft_docs_cat").count() === direct._1 + 10)
    } finally spark.sql("DROP TABLE IF EXISTS graft_docs_cat")
  }
}
