package graft.tools
object AudioProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(f: => Long): Unit = (0 until 2).foreach { i =>
      val t0 = System.nanoTime(); val n = f
      println(f"[aprof] $l rep$i: ${(System.nanoTime()-t0)/1e9}%.3fs rows=$n")
    }
    time("docs_ids")(graft.core.Tables.documents(spark, sfDir).select("doc_id").count())
    time("audio_frame")(graft.queries.Multimodal.audioFrame(spark, sfDir).count())
    time("full_lane")(graft.queries.Multimodal.q32AudioDecode(spark, sfDir).count())
    time("img_frame")(graft.queries.Multimodal.imagesFrame(spark, sfDir).count())
    spark.stop()
  }
}
