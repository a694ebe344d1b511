package graft

/** One spec per declared operator (SURVEY §2B → SparkEntry.queries): each
  * query builds, runs at sf0.001, yields a stable schema and a
  * deterministic row count across re-execution. Value-level correctness is
  * the DuckDB oracle harness's job (t2); this is the fast per-operator
  * gate that keeps `sbt test` meaningful when a query is edited.
  */
class QuerySmokeSpec extends SparkSpec {

  // queries whose result is legitimately empty at sf0.001
  private val mayBeEmpty = Set("q09_anti_join", "q24_jaccard_pairs",
    "q24_lsh_pairs", "q24_simhash_pairs")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: builds, runs, deterministic at sf0.001") {
      val df1 = fn(spark, sf001)
      assert(df1.schema.fields.nonEmpty, "empty schema")
      val n1 = df1.count()
      if (!mayBeEmpty(name)) assert(n1 > 0, s"$name returned 0 rows")
      val n2 = fn(spark, sf001).count()
      assert(n1 === n2, s"$name row count not deterministic: $n1 != $n2")
    }
  }

  test("entry() flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
