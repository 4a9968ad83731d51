import graft.GraftSession
import graft.pipeline.{ExtractJob, ExtractPipeline}
import org.apache.spark.sql.functions._

/** Opt-in probe: where does the commit pipeline's wall time go?
  * (`sbt "Test/runMain XCommitPhases [nDocs]"`) — times hot-host
  * detection, the staged extraction materialization, and the full
  * ExtractJob.run, mirroring the bench's x_commit phase. */
object XCommitPhases {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 480000L
    val spark = GraftSession.local(32, "graft-xcommit-phases")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup on a small run (JIT + codegen)
    ExtractJob.run(spark, java.nio.file.Files.createTempDirectory("xp-w").toString,
      20000L, groups = 2, commitId = "w")

    val pages = ExtractPipeline.pages(spark, n).toDF()
    val tGen = timed { pages.agg(count(lit(1))).collect() } // pure generation pass
    val tHot = timed { ExtractPipeline.hotHosts(pages, math.min(n, 2000L), 0.05, totalHint = n) }
    val tExtract = timed {
      ExtractPipeline.extracted(pages)
        .agg(sum(length(coalesce(col("text"), lit(""))))).collect()
    } // generation + extraction, no write
    val reps = (1 to 3).map { r =>
      val root = java.nio.file.Files.createTempDirectory(s"xp-$r").toString
      timed { ExtractJob.run(spark, root, n, buckets = 32, groups = 4, commitId = s"p-$r") }
    }
    println(f"XPHASES gen=$tGen%.2f hot=$tHot%.2f gen_extract=$tExtract%.2f full_commit_median=${reps.sorted.apply(1)}%.2f reps=${reps.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
