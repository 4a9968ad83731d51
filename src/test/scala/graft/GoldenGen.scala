package graft

/** One-time golden-fixture writer (FIXTURES.md §2): runs the
  * single-threaded oracle over the tiny fixture (ids 0..199) and
  * freezes the result at src/test/resources/golden/extracted-tiny.parquet.
  * Regenerate ONLY on a deliberate extraction-contract change:
  *   sbt "Test/runMain graft.GoldenGen"
  * (GoldenFixtureSpec + the digest in GoldenHashes must be updated in
  * the same commit — both will fail loudly otherwise.) */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(1, "golden-gen") // single-threaded oracle
    import spark.implicits._
    val rows = (0L until 200L).map { id =>
      val row = gen.PageGen.row(id)
      val r = extract.Extractor.extract(row.html, row.lang)
      (row.url, r.text, r.spans.map(s => (s.start, s.end, s.kind)), row.lang, r.error)
    }
    val out = "src/test/resources/golden/extracted-tiny.parquet"
    rows.toDF("url", "text", "spans", "lang", "error")
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"GOLDEN_WRITTEN $out rows=${rows.length}")
    spark.stop()
  }
}
