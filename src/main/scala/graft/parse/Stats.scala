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

  /** CJK display width (cli/normalize_headings.py:17-51): east-asian
    * Full/Wide/Ambiguous = 2 columns, else 1 (report rendering). */
  def displayWidth(s: String): Int = {
    var w = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val wide = (cp >= 0x1100 && cp <= 0x115f) || // hangul jamo
        (cp >= 0x2e80 && cp <= 0xa4cf) || // CJK radicals..yi
        (cp >= 0xac00 && cp <= 0xd7a3) || // hangul syllables
        (cp >= 0xf900 && cp <= 0xfaff) || // CJK compat ideographs
        (cp >= 0xfe30 && cp <= 0xfe4f) || // CJK compat forms
        (cp >= 0xff00 && cp <= 0xff60) || // fullwidth forms
        (cp >= 0xffe0 && cp <= 0xffe6) ||
        (cp >= 0x20000 && cp <= 0x3fffd)
      w += (if (wide) 2 else 1)
      i += Character.charCount(cp)
    }
    w
  }
}
