import graft.GraftSession
import graft.pipeline.ExtractJob

/** Opt-in probe: commit-pipeline wall time per cache mode
  * (`sbt "Test/runMain XCommitProbe [nDocs]"`). Extraction now runs at
  * the parquet-scan ceiling, so recomputing it per resume group can
  * beat serializing 480k extracted rows into the block store — this
  * measures the trade on the real pipeline. */
object XCommitProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 480000L
    val spark = GraftSession.local(32, "graft-xcommit")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup (JIT + codegen) on a small run
    ExtractJob.run(spark, java.nio.file.Files.createTempDirectory("xc-w").toString,
      20000L, groups = 2, commitId = "w")
    Seq("ser", "mem", "none").foreach { mode =>
      val reps = (1 to 3).map { r =>
        val root = java.nio.file.Files.createTempDirectory(s"xc-$mode-$r").toString
        timed { ExtractJob.run(spark, root, n, groups = 4, commitId = s"p-$mode-$r", cache = mode) }
      }
      println(f"XCOMMIT mode=$mode%-5s median=${reps.sorted.apply(1)}%.2f reps=${reps.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
