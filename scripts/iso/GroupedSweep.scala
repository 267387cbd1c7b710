object GroupedSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val n = args(1).toInt
    val statuses = scala.io.Source.fromFile(s"$dir/grouped_status.txt").getLines().toVector
    var fails = 0
    (0 until n).foreach { i =>
      val lines = scala.io.Source.fromFile(s"$dir/doc_$i.md", "UTF-8").getLines().toVector
      val doc = graft.model.InputDoc(s"doc_$i",
        lines.zipWithIndex.map { case (l, o) => graft.model.Span("line", l, "", o) })
      val expected = statuses(i)
      val got = try { Right(graft.sink.GroupedXml.buildGroupedXml(doc)) }
        catch { case e: Exception => Left(e) }
      (expected, got) match {
        case ("OK", Right(x)) =>
          val exp = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"$dir/doc_$i.grouped.xml")), "UTF-8")
          if (x != exp) {
            val at = x.zip(exp).indexWhere { case (a, b) => a != b }
            println(s"doc_$i DIFF at $at: got …${x.slice(at-40, at+60)}… exp …${exp.slice(at-40, at+60)}…")
            fails += 1
          }
        case ("OK", Left(e)) => println(s"doc_$i UNEXPECTED RAISE ${e.getClass.getSimpleName}: ${e.getMessage}"); fails += 1
        case (st, Right(_)) if st.startsWith("RAISED") => println(s"doc_$i expected $st but SUCCEEDED"); fails += 1
        case (st, Left(e)) =>
          val refKind = st.stripPrefix("RAISED:")
          val myKind = e match {
            case _: graft.sink.GroupedXml.PageValidationException => "PageValidationError"
            case _: NumberFormatException => "ValueError"
            case o => o.getClass.getSimpleName
          }
          if (refKind != myKind) { println(s"doc_$i raise kind: ref=$refKind mine=$myKind"); fails += 1 }
      }
    }
    println(s"grouped sweep done, $fails failures")
  }
}
