import org.apache.spark.sql.functions._

/** Scan-only throughput: what does the parquet read of html cost alone? */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = graft.GraftSession.local(cores, "scanprobe")
    val stage = "/tmp/xbench-pages-960000"
    spark.read.parquet(stage).agg(sum(length(col("html")))).collect() // warm page cache
    val t0 = System.nanoTime()
    spark.read.parquet(stage).agg(sum(length(col("html")))).collect()
    val el = (System.nanoTime() - t0) / 1e9
    println(f"SCAN cores=$cores elapsed=$el%.2f docs_per_sec=${960000 / el}%.0f")
    spark.stop()
  }
}
