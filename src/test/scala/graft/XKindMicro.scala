object XKindMicro {
  def main(args: Array[String]): Unit = {
    // pre-generate rows by kind
    val ids = (0L until 100000L)
    val byKind = ids.groupBy(id => graft.gen.PageGen.kindOf(id))
    byKind.foreach { case (k, kids) =>
      val rows = kids.take(20000).map(graft.gen.PageGen.row(_)).toArray
      // warm
      rows.take(2000).foreach(r => graft.extract.Extractor.extract(r.html, r.lang))
      var acc = 0L
      val t0 = System.nanoTime()
      rows.foreach { r =>
        val res = graft.extract.Extractor.extract(r.html, r.lang)
        acc += (if (res.text == null) 0 else res.text.length)
      }
      val el = (System.nanoTime() - t0) / 1e9
      val per = el * 1e6 / rows.length
      println(f"KIND $k n=${rows.length} total=$el%.3f s per_doc=$per%.1f us acc=$acc")
    }
  }
}
