package graft

import org.apache.spark.sql.execution.ExplainMode

/** Per-query isolation harness for optimization work (guide §1.4) —
  * separate from the FROZEN `Bench`: times individual declared queries
  * with the same action (`count()`) and scale factor as the driver's
  * bench, with repeats and per-rep steal markers, and optionally dumps
  * `.explain("formatted")` for each query to a plans directory.
  *
  * Usage: `sbt "runMain graft.BenchExtra q1_agg d2_ngram_jaccard"`
  * (or `all`). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_XREPS (default 3), SPARK_GRAFT_PLANS (dir; if set,
  * writes `<dir>/<query>.txt` plan files).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_XREPS", "3").toInt
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS")
    val spark = GraftSession.local(cpus, "graft-benchextra")

    val names: Seq[String] =
      if (args.isEmpty || args.sameElements(Array("all")))
        SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      plansDir.foreach { dir =>
        new java.io.File(dir).mkdirs()
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(s"$dir/$name.txt", "UTF-8")
        try w.println(plan) finally w.close()
      }
      val runs = (1 to reps).map { _ =>
        ScalePair.withSteal {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
      }
      val times = runs.map(_._1).sorted
      val steals = runs.map(_._2)
      val med = times(times.length / 2)
      println(f"""{"query":"$name","median":$med%.3f,"min":${times.min}%.3f,"times":[${runs.map(r => f"${r._1}%.3f").mkString(",")}],"steals":[${steals.map(s => f"$s%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
