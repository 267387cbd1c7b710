object DbgMatch {
  def main(args: Array[String]): Unit = {
    val lines = graft.io.SyntheticCorpus.genLines(8L).map(_._2)
    val parsed = graft.parse.PageParser.parseDocument(lines.toIndexedSeq)
    println("TOC entries:")
    parsed.tocEntries.foreach(e => println(s"  level=${e.level} number='${e.number}' text='${e.text}' page='${e.page}'"))
    val headings = parsed.pages.flatMap(_.elements).collect { case h: graft.model.Heading => h }
    println("headings (first 8):")
    headings.take(8).foreach(h => println(s"  L${h.level} '${h.text}'"))
    val stripped = headings.zipWithIndex.map { case (h, i) =>
      graft.matching.TocMatcher.BodyHeading(h.text.replaceFirst("^第[0-9]+章\\s*", ""), h.level, i + 1) }
    val ms = graft.matching.TocMatcher.matchTocToBody(parsed.tocEntries, stripped)
    ms.foreach(m => println(s"  ${m.matchType} toc='${m.tocEntry.text}' body=${m.bodyHeading.map(_.text)} sim=${m.similarity}"))
    val rules = graft.matching.NormalizationRules.generateRules(ms)
    println("rules: " + rules.size)
    rules.take(5).foreach(println)
  }
}
