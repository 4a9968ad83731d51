/** Opt-in soak: byte-identity of generator ground truth vs extractor
  * over a large id range (not part of sbt test — run explicitly:
  * `sbt "Test/runMain SoakCheck 100000"`). */
object SoakCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    var mismatches = 0L
    var checked = 0L
    (0L until n).foreach { id =>
      val row = graft.gen.PageGen.row(id)
      val got = graft.extract.Extractor.extract(row.html, row.lang)
      graft.gen.PageGen.kindOf(id) match {
        case graft.gen.PageGen.Html | graft.gen.PageGen.Pdf =>
          checked += 1
          if (got.error != null || got.text != row.text) {
            mismatches += 1
            if (mismatches <= 3)
              System.err.println(s"MISMATCH id=$id err=${got.error}")
          }
        case graft.gen.PageGen.BadUtf8 | graft.gen.PageGen.BadPdf =>
          checked += 1
          if (got.error == null) { mismatches += 1 }
        case _ => ()
      }
    }
    println(s"SOAK n=$n checked=$checked mismatches=$mismatches")
    assert(mismatches == 0)
  }
}
