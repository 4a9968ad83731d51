/** Fresh-JVM check that `--conf spark.sql.extensions=graft.GraftExtensions`
  * wires the function surface without any GraftSession.register call
  * (scalatest suites share a session, so this needs its own JVM —
  * run via `sbt "Test/runMain ExtensionsCheck"`). */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-check")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT graft_simhash('hello world hello') AS h,
        |       graft_langid('مرحبا بالعالم') AS l,
        |       graft_extract(CAST('<html><body><article><p>one two three four five six seven
        | eight nine ten eleven twelve thirteen fourteen fifteen sixteen</p></article></body></html>' AS BINARY), 'en').text AS t
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) != 0L, "simhash")
    assert(r.getString(1) == "ar", s"langid: ${r.getString(1)}")
    assert(r.getString(2).startsWith("--- صفحة 1 ---"), s"extract: ${r.getString(2)}")
    println("EXTENSIONS_CHECK_OK " + r.getString(2).replace("\n", "\\n"))
    spark.stop()
  }
}
