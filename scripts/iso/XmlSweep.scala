object XmlSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val n = args(1).toInt
    var fails = 0
    (0 until n).foreach { i =>
      val lines = scala.io.Source.fromFile(s"$dir/doc_$i.md", "UTF-8").getLines().toVector
      val doc = graft.model.InputDoc(s"doc_$i",
        lines.zipWithIndex.map { case (l, o) => graft.model.Span("line", l, "", o) })
      val got = graft.sink.XmlBuilder.buildXmlWithErrors(doc)
      val exp = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/doc_$i.ref.xml")), "UTF-8")
      if (got != exp) {
        val at = got.zip(exp).indexWhere { case (a, b) => a != b }
        println(s"doc_$i DIFF at $at: got …${got.slice(at-30, at+40)}… exp …${exp.slice(at-30, at+40)}…")
        fails += 1
      }
    }
    println(s"xml sweep done, $fails failures")
  }
}
