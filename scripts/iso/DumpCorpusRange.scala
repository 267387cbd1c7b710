object DumpCorpusRange {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val start = args(1).toLong; val n = args(2).toInt
    new java.io.File(outDir).mkdirs()
    (0 until n).foreach { i =>
      val lines = graft.io.SyntheticCorpus.genLines(start + i).map(_._2)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/doc_$i.md"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    println(s"wrote $n docs from $start")
  }
}
