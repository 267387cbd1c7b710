package graft.parse

/** Small reporting utilities from the reference. */
object Stats {

  final case class MarkerStats(toc: Int, content: Int, skip: Int)

  /** count_markers (parser/utils.py:105-136): counts of toc/content/skip
    * START markers over the document lines. Relationally this is
    * agg(sum(when(...))) over exploded lines (SURVEY §2.3). */
  def countMarkers(lines: Seq[String]): MarkerStats = {
    var toc = 0; var content = 0; var skip = 0
    lines.foreach { line =>
      Markers.parseTocMarker(line) match {
        case Some(Markers.TocStart) => toc += 1
        case _ =>
          Markers.parseContentMarker(line) match {
            case Some(Markers.ContentStart) => content += 1
            case Some(Markers.SkipStart)    => skip += 1
            case _                          =>
          }
      }
    }
    MarkerStats(toc, content, skip)
  }

  /** CJK display width (cli/normalize_headings.py:17-26): east-asian
    * Full/Wide/AMBIGUOUS = 2 columns, else 1 — exact unicodedata table
    * ([[graft.text.EastAsianWidth]], generated), not an approximation:
    * Ambiguous covers ±, §, Greek/Cyrillic, circled digits, which hand
    * range tables miss. */
  def displayWidth(s: String): Int = {
    var w = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      w += (if (graft.text.EastAsianWidth.isWide(cp)) 2 else 1)
      i += Character.charCount(cp)
    }
    w
  }
}
