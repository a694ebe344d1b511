object AnsiCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    println("[ansi] " + spark.conf.get("spark.sql.ansi.enabled"))
    val df = graft.queries.Analytics.q63Regression(spark, "/tmp/graft_scale128")
    df.show(5, false)
    spark.stop()
  }
}
