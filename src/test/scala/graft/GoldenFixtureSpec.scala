package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ExtractPipeline

/** Frozen-golden replay (FIXTURES.md §2, SURVEY.md §5.2 item 1): the
  * PARALLEL pipeline must byte-match the checked-in single-threaded
  * oracle parquet via a full-outer join with zero mismatches (the J3
  * harness join, SURVEY.md §2.3). */
class GoldenFixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(8, "graft-golden-test")

  val goldenPath = "src/test/resources/golden/extracted-tiny.parquet"

  test("parallel pipeline full-outer-joins the frozen golden with zero mismatches") {
    assume(new java.io.File(goldenPath).exists(), s"golden missing: run Test/runMain graft.GoldenGen")
    val golden = spark.read.parquet(goldenPath)
      .select(col("url"), col("text").as("g_text"), col("error").as("g_error"),
        col("spans").as("g_spans"))
    val out = ExtractPipeline.extracted(ExtractPipeline.pages(spark, 200).toDF())
      .select(col("url"),
        col("text"), col("error"),
        transform(col("spans"), s =>
          struct(s.getField("start").as("_1"), s.getField("end").as("_2"),
            s.getField("kind").as("_3"))).as("spans"))
    val joined = out.join(golden, Seq("url"), "full_outer")
    assert(joined.count() == 200, "row sets must align exactly")
    val mismatches = joined.filter(
      !(col("text") <=> col("g_text")) ||
        !(col("error") <=> col("g_error")) ||
        !(col("spans") <=> col("g_spans")))
    val bad = mismatches.select("url").collect().map(_.getString(0))
    assert(bad.isEmpty, s"golden mismatches: ${bad.take(5).mkString(", ")}")
  }
}
