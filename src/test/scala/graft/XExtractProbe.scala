import graft.GraftSession
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.functions._

/** x_extract isolation (r6): scan-only vs scan+extract over the
  * bench's staged pages, with the bench's exact aggregate action. */
object XExtractProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "x-extract-probe")
    val stage = "/tmp/graft-bench-pages-480000"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def scanOnly(): Unit =
      spark.read.parquet(stage).agg(sum(length(col("html")))).collect()
    def extractRun(): Unit =
      ExtractPipeline.extracted(spark.read.parquet(stage))
        .agg(sum(length(coalesce(col("text"), lit("")))),
          sum(when(col("error").isNotNull, 1L).otherwise(0L))).collect()
    scanOnly(); extractRun() // warm
    val scans = (1 to 3).map(_ => timed(scanOnly()))
    val exts = (1 to 5).map(_ => timed(extractRun()))
    println(f"XEXTRACT scan_med=${scans.sorted.apply(1)}%.2f extract_med=${exts.sorted.apply(2)}%.2f scans=${scans.map(x => f"$x%.2f").mkString(",")} exts=${exts.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
