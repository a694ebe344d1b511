package graft.tools

/** Dev-only overflow probe: evaluates q63's DERIVED columns (show, not
  * count — count() lets Catalyst prune exactly the expressions under
  * test) against SPARK_GRAFT_SF_DIR under the session's ANSI default.
  * This is the probe that caught the 128× int64 overflow the smoke
  * rehearsals missed (PLANS.md round-9 session 4). Not benched/verified.
  */
object AnsiCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    println("[ansi] " + spark.conf.get("spark.sql.ansi.enabled"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale128")
    graft.queries.Analytics.q63Regression(spark, dir).show(5, false)
    graft.queries.Analytics.q64Autocorr(spark, dir).show(5, false)
    graft.queries.Evaluation.q66ChisqDrift(spark, dir).show(5, false)
    spark.stop()
  }
}
