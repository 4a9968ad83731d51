object ExplainTest {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4, "explain")
    val df = graft.pipeline.ExtractPipeline.extracted(
      graft.pipeline.ExtractPipeline.pages(spark, 10).toDF())
    df.explain("formatted")
    spark.stop()
  }
}
