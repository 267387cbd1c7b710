object SweepCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    var fails = 0
    (0 until args(1).toInt).foreach { i =>
      val lines = scala.io.Source.fromFile(s"$dir/doc_$i.md", "UTF-8").getLines().toVector
      val doc = graft.model.InputDoc(s"doc_$i",
        lines.zipWithIndex.map { case (l, o) => graft.model.Span("line", l, "", o) })
      val got = graft.pipeline.Extract.extractDoc(doc).spans
      val exp = scala.io.Source.fromFile(s"$dir/doc_$i.golden.tsv", "UTF-8").getLines()
        .filterNot(_.startsWith("#")).toVector
      if (got.length != exp.length) { println(s"doc_$i COUNT ${got.length} vs ${exp.length}"); fails += 1 }
      else {
        def unesc(s: String) = s.replace("\\n", "\n").replace("\\t", "\t").replace("\\\\", "\\")
        got.zip(exp).zipWithIndex.foreach { case ((g, e), idx) =>
          val f = e.split("\t", -1)
          val ok = g.offset == f(0).toInt && g.kind == f(1) && g.text == unesc(f(2)) &&
            g.media_ref == unesc(f(3)) && g.page_no == f(4) && g.level == f(5).toInt &&
            g.read_aloud == (f(6) == "true") && g.attrs == unesc(f(7))
          if (!ok) { println(s"doc_$i span $idx DIFF\n got $g\n exp $e"); fails += 1 }
        }
      }
    }
    println(s"sweep done, $fails failures")
  }
}
