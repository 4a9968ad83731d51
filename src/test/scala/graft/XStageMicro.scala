object XStageMicro {
  def main(args: Array[String]): Unit = {
    val rows = (0L until 60000L).filter(id => graft.gen.PageGen.kindOf(id) == graft.gen.PageGen.Html)
      .take(20000).map(graft.gen.PageGen.row(_)).toArray
    def bench(name: String)(f: => Long): Unit = {
      f // warm
      f
      val t0 = System.nanoTime(); val acc = f
      val el = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name ${el * 1e6 / rows.length}%.1f us/doc acc=$acc")
    }
    bench("decode") {
      var a = 0L; rows.foreach { r => a += graft.extract.Extractor.decodeUtf8(r.html).get.length }; a
    }
    val decoded = rows.map(r => new String(r.html, "UTF-8"))
    bench("segmentRaw") {
      var a = 0L; decoded.foreach { s => a += graft.html.FusedSegmenter.segmentRaw(s).n }; a
    }
    val rbs = decoded.map(graft.html.FusedSegmenter.segmentRaw)
    bench("classifyRaw") {
      var a = 0L; rbs.foreach { rb => a += graft.html.Boilerplate.classifyRaw(rb, graft.html.Boilerplate.Default).count(identity) }; a
    }
    val keeps = rbs.map(rb => graft.html.Boilerplate.classifyRaw(rb, graft.html.Boilerplate.Default))
    bench("assemble") {
      var a = 0L
      var i = 0
      while (i < rbs.length) { a += graft.extract.Assemble.fromRaw(rbs(i), keeps(i))._1.length; i += 1 }
      a
    }
    bench("full") {
      var a = 0L; rows.foreach { r => a += graft.extract.Extractor.extract(r.html, r.lang).text.length }; a
    }
  }
}
