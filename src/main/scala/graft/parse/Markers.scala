package graft.parse

import java.util.regex.Pattern
import graft.model.{Figure, Heading, ListEl, PageMeta}
import graft.text.Py

/** Line-level recognizers for the markdown surface of the input spans.
  * Faithful ports of:
  *  - page markers: src/book_converter/parser/page.py:38-116
  *  - page metadata: parser/page.py:134-176
  *  - headings: parser/heading.py:66-125
  *  - toc/content/skip markers: parser/toc.py:10-79
  *  - list detection: parser/utils.py:15-74
  *  - figure comment/placeholder/assembly: parser/figure.py:49-167
  */
object Markers {

  private val U = Pattern.UNICODE_CHARACTER_CLASS

  // ---- page markers ------------------------------------------------------

  private val pageP1 = Pattern.compile("---\\s+[Pp]age\\s+(\\d+)\\s+\\((.+?)\\)\\s+---", U)
  private val pageP2 = Pattern.compile("---\\s+page_(\\d+)\\s+---", U)
  private val pageNoNum = Pattern.compile("---\\s+[Pp]age\\s+\\((.+?)\\)\\s+---", U)
  private val pageColon = Pattern.compile("---\\s+[Pp]age:\\s*(.+?)\\s*---", U)
  // U flag required: python \d = Unicode Nd, so "page_００７.png" -> "7"
  private val pageNumInFile = Pattern.compile("page_(\\d+)", U)

  /** parse_page_marker + extract_page_number: (page_number, source_file);
    * ("","") when the line is not a page marker. */
  def extractPageNumber(line: String): (String, String) = {
    // all four marker patterns contain a literal "---"; skip regex work
    // on the ~95% of lines that cannot match (semantics unchanged)
    if (!line.contains("---")) return ("", "")
    val m1 = pageP1.matcher(line)
    if (m1.find()) return (m1.group(1), m1.group(2))
    val m2 = pageP2.matcher(line)
    if (m2.find()) return (graft.text.Py.toInt(m2.group(1)).toString, "page_" + m2.group(1))
    val m3 = pageNoNum.matcher(line)
    if (m3.find()) return ("", m3.group(1))
    val m4 = pageColon.matcher(line)
    if (m4.find()) {
      val sourceFile = Py.strip(m4.group(1))
      val mn = pageNumInFile.matcher(sourceFile)
      if (mn.find()) return (graft.text.Py.toInt(mn.group(1)).toString, sourceFile)
      return ("", sourceFile)
    }
    ("", "")
  }

  // ---- page metadata (N / M) --------------------------------------------

  private val pageMetaP = Pattern.compile("^(.*?)\\s*(\\d+)\\s*/\\s*(\\d+)\\s*$", U)

  /** parse_page_metadata (page.py:134-176). Input must be pre-stripped by
    * the caller (the reference passes line.strip()). */
  def parsePageMetadata(text: String): Option[PageMeta] = {
    if (text.indexOf('/') < 0) return None
    val m = pageMetaP.matcher(Py.strip(text))
    if (!m.matches()) return None
    val sectionName = Py.strip(m.group(1))
    val metaType = if (sectionName.contains("節")) "section-page" else "chapter-page"
    Some(PageMeta(text, metaType, sectionName, graft.text.Py.toInt(m.group(2)), graft.text.Py.toInt(m.group(3))))
  }

  // ---- headings ----------------------------------------------------------

  private val headingP = Pattern.compile("^(#{1,6})\\s*(.*)$", U)

  /** parse_heading_with_warning (heading.py:101-125): level capped at 3,
    * original level 4+ yields a warning message. */
  def parseHeadingWithWarning(line: String): (Option[Heading], Option[String]) = {
    if (line.isEmpty || line.charAt(0) != '#') return (None, None)
    val m = headingP.matcher(line)
    if (!m.matches()) return (None, None)
    val originalLevel = m.group(1).length
    val level = math.min(originalLevel, 3)
    val h = Heading(level, m.group(2))
    val warning =
      if (originalLevel > 3) Some(s"見出しlevel ${originalLevel}階層は3階層に統合されました")
      else None
    (Some(h), warning)
  }

  def parseHeading(line: String): Option[Heading] = parseHeadingWithWarning(line)._1

  // ---- toc / content / skip markers ---------------------------------------

  sealed trait Marker
  case object TocStart extends Marker
  case object TocEnd extends Marker
  case object ContentStart extends Marker
  case object ContentEnd extends Marker
  case object SkipStart extends Marker
  case object SkipEnd extends Marker

  private val tocMarkerP = Pattern.compile("<!--\\s*(/?)\\s*[Tt][Oo][Cc]\\s*-->", U)
  private val contentMarkerP = Pattern.compile("<!--\\s*(/?)\\s*[Cc][Oo][Nn][Tt][Ee][Nn][Tt]\\s*-->", U)
  private val skipMarkerP = Pattern.compile("<!--\\s*(/?)\\s*[Ss][Kk][Ii][Pp]\\s*-->", U)

  def parseTocMarker(line: String): Option[Marker] = {
    if (!line.contains("<!--")) return None
    val m = tocMarkerP.matcher(line)
    if (m.find()) Some(if (m.group(1).nonEmpty) TocEnd else TocStart) else None
  }

  def parseContentMarker(line: String): Option[Marker] = {
    if (!line.contains("<!--")) return None
    val mc = contentMarkerP.matcher(line)
    if (mc.find()) return Some(if (mc.group(1).nonEmpty) ContentEnd else ContentStart)
    val ms = skipMarkerP.matcher(line)
    if (ms.find()) return Some(if (ms.group(1).nonEmpty) SkipEnd else SkipStart)
    None
  }

  /** get_read_aloud_from_stack (utils.py:77-102): top-of-stack != "skip". */
  def readAloudFromStack(stack: List[String]): Boolean =
    stack.headOption.forall(_ != "skip")

  // ---- list detection ------------------------------------------------------

  /** parser/utils.py:15-40 — checked in declaration order. */
  private val bulletMarkers = Vector("●", "○", "◎", "•", "·", "・", "◆", "◇", "■", "□", "▶", "▷", "►", "-", "*")

  private val orderedListP = Pattern.compile(
    "^\\s*(" +
      "[①②③④⑤⑥⑦⑧⑨⑩⑪⑫⑬⑭⑮⑯⑰⑱⑲⑳]" +
      "|[（(]\\d+[)）]" +
      "|\\d+[.．)）]" +
      ")\\s*(.*)$",
    U
  )

  /** is_list_line: (isList, listType, content). */
  def isListLine(line: String): (Boolean, String, String) = {
    val stripped = Py.strip(line)
    if (stripped.isEmpty) return (false, "", "")
    for (marker <- bulletMarkers) {
      if (stripped.startsWith(marker)) {
        val rest = Py.lstrip(stripped.substring(marker.length))
        if (rest.nonEmpty) return (true, "unordered", rest)
      }
    }
    val m = orderedListP.matcher(stripped)
    if (m.matches()) {
      val content = Py.strip(m.group(2))
      if (content.nonEmpty) return (true, "ordered", content)
    }
    (false, "", "")
  }

  /** parse_list (figure.py:11-47). */
  def parseList(lines: Seq[String]): Option[ListEl] = {
    if (lines.isEmpty) return None
    var listType = "unordered"
    val items = Vector.newBuilder[String]
    var first = true
    lines.foreach { line =>
      val (isList, t, content) = isListLine(line)
      if (isList) {
        if (first) { listType = t; first = false }
        items += content
      }
    }
    val v = items.result()
    if (v.isEmpty) None else Some(ListEl(v, listType))
  }

  // ---- figures -------------------------------------------------------------

  private val figureCommentP = Pattern.compile("<!--\\s*[Ff][Ii][Gg][Uu][Rr][Ee]:\\s*(.+?)\\s*-->", U)
  private val boldP = Pattern.compile("\\*\\*(.+?)\\*\\*")

  /** parse_figure_comment (figure.py:49-72). */
  def parseFigureComment(line: String): Option[String] = {
    if (!line.contains("<!--")) return None
    val m = figureCommentP.matcher(line)
    if (m.find()) {
      val path = Py.strip(m.group(1))
      if (path.nonEmpty) Some(path) else None
    } else None
  }

  private val figurePlaceholderP =
    Pattern.compile("\\[(図|写真|表|イラスト|グラフ|チャート)([^\\]]*)\\]")

  /** parse_figure_placeholder (figure.py:75-103): [図N] [写真N] ... markers. */
  def parseFigurePlaceholder(line: String): Option[String] = {
    val m = figurePlaceholderP.matcher(line)
    if (m.find()) Some(m.group(1) + m.group(2)) else None
  }

  /** parse_figure (figure.py:106-167): path from comment line, caption from
    * first bold text; remaining description lines are dropped (the
    * reference's "new format" keeps path+caption only). */
  def parseFigure(lines: Seq[String]): Option[Figure] = {
    if (lines.isEmpty) return None
    val path = lines.iterator.flatMap(parseFigureComment(_)).nextOption()
    path.map { p =>
      var caption = ""
      lines.foreach { line =>
        if (parseFigureComment(line).isEmpty && Py.strip(line).nonEmpty) {
          val m = boldP.matcher(line)
          if (m.find() && caption.isEmpty) caption = m.group(1)
        }
      }
      Figure(p, caption, "")
    }
  }
}
