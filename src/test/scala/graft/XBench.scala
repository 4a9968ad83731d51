import org.apache.spark.sql.functions._

/** Focused extraction-throughput probe.
  * XBench <cores> <docs> [parts] — stages the pages table to parquet
  * once (generation excluded from timing), then times the real metric:
  * table scan → graft_extract → aggregate. */
object XBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val docs = args(1).toLong
    val parts = if (args.length > 2) args(2).toInt else cores * 4
    val spark = graft.GraftSession.local(cores, "xbench")
    import spark.implicits._

    val stage = s"/tmp/xbench-pages-$docs"
    if (!new java.io.File(stage, "_SUCCESS").exists()) {
      spark.range(0L, docs, 1L, 128)
        .mapPartitions(_.map(id => graft.gen.PageGen.row(id.longValue()))).toDF()
        .write.mode("overwrite").parquet(stage)
    }

    def run(): Double = {
      val t0 = System.nanoTime()
      graft.pipeline.ExtractPipeline.extracted(spark.read.parquet(stage))
        .agg(sum(length(coalesce(col("text"), lit(""))))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup on a slice: JIT for the whole extract path
    graft.pipeline.ExtractPipeline.extracted(spark.read.parquet(stage).limit(20000))
      .agg(sum(length(coalesce(col("text"), lit(""))))).collect()
    val el = run()
    println(f"XBENCH cores=$cores parts=$parts docs=$docs elapsed=$el%.2f docs_per_sec=${docs / el}%.0f")
    spark.stop()
  }
}
