/** Consolidate-sink sweep: byte-compares graft.sink.Consolidate's
  * book.txt / book.md against reference-generated goldens
  * (scripts/gen_consolidate_golden.py) for every dumped book. */
object MdSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val n = args(1).toInt
    var fails = 0
    (0 until n).foreach { i =>
      val lines = scala.io.Source.fromFile(s"$dir/doc_$i.md", "UTF-8").getLines().toVector
      val raiseMarker = new java.io.File(s"$dir/doc_$i.book.raise")
      val attempt = scala.util.Try(graft.sink.Consolidate.consolidate(
        graft.sink.Consolidate.roverPages(lines)))
      if (raiseMarker.exists()) {
        if (!attempt.isFailure ||
            !attempt.failed.get.isInstanceOf[java.io.FileNotFoundException]) {
          println(s"doc_$i DIFF: reference raises FileNotFoundError, got $attempt")
          fails += 1
        }
      } else if (attempt.isFailure) {
        println(s"doc_$i DIFF: unexpected ${attempt.failed.get}")
        fails += 1
      } else {
        val (txt, md) = attempt.get
        for ((got, ext) <- Seq((txt, "book.txt"), (md, "book.md"))) {
          val exp = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"$dir/doc_$i.$ext")), "UTF-8")
          if (got != exp) {
            val at0 = got.zip(exp).indexWhere { case (a, b) => a != b }
            val at = if (at0 < 0) math.min(got.length, exp.length) else at0
            println(s"doc_$i.$ext DIFF at $at: got …${got.slice(at - 30, at + 40)}… " +
              s"exp …${exp.slice(at - 30, at + 40)}…")
            fails += 1
          }
        }
      }
    }
    println(s"md sweep done, $fails failures")
  }
}
