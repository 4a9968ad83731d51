object Micro {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val docsPerThread = args(1).toInt
    val genOnly = args.length > 2 && args(2) == "gen"
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var i = 0L
        var acc = 0L
        while (i < docsPerThread) {
          val id = t.toLong * docsPerThread + i
          val row = graft.gen.PageGen.row(id)
          if (!genOnly) {
            val r = graft.extract.Extractor.extract(row.html, row.lang)
            acc += (if (r.text == null) 0 else r.text.length)
          }
          i += 1
        }
        System.out.println(s"thread $t done acc=$acc")
      })
      th.start(); th
    }
    ts.foreach(_.join())
    val el = (System.nanoTime() - t0) / 1e9
    println(f"threads=$threads docs=${threads * docsPerThread} elapsed=$el%.2f docs_per_sec=${threads * docsPerThread / el}%.0f")
  }
}
