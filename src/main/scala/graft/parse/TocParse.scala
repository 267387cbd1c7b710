package graft.parse

import java.util.regex.Pattern
import graft.model.TocEntry
import graft.text.Py

/** TOC parsing, faithful to src/book_converter/parser/toc.py:79-482. */
object TocParse {

  private val U = Pattern.UNICODE_CHARACTER_CLASS

  private val tocPrefixP = Pattern.compile("^[#\\-*]+\\s*", U)
  private val emphasisP = Pattern.compile("\\*\\*")

  /** normalize_toc_line (toc.py:79-105). */
  def normalizeTocLine(line: String): String = {
    val s = tocPrefixP.matcher(Py.strip(line)).replaceFirst("")
    emphasisP.matcher(s).replaceAll("")
  }

  private val chapterOnlyP = Pattern.compile("^Chapter$", Pattern.CASE_INSENSITIVE)
  private val episodeOnlyP = Pattern.compile("^Episode\\s+\\d+$", Pattern.CASE_INSENSITIVE | U)
  private val columnOnlyP = Pattern.compile("^[Cc][Oo][Ll][Uu][Mm][Nn]$")
  private val digitLeadP = Pattern.compile("^\\d+\\s+", U)

  /** merge_toc_lines (toc.py:108-209). */
  def mergeTocLines(lines: Seq[String]): Vector[String] = {
    if (lines.isEmpty) return Vector.empty
    val arr = lines.toIndexedSeq
    val result = Vector.newBuilder[String]
    var idx = 0
    while (idx < arr.length) {
      val line = Py.strip(arr(idx))
      if (line.isEmpty) idx += 1
      else {
        val mergePattern: String =
          if (chapterOnlyP.matcher(line).find()) "chapter"
          else if (episodeOnlyP.matcher(line).find()) "episode"
          else if (columnOnlyP.matcher(line).find()) "column"
          else ""
        if (mergePattern.nonEmpty) {
          var nextIdx = idx + 1
          var nextLine = ""
          var found = false
          while (nextIdx < arr.length && !found) {
            val candidate = Py.strip(arr(nextIdx))
            if (candidate.nonEmpty) { nextLine = candidate; found = true }
            else nextIdx += 1
          }
          val shouldMerge = nextLine.nonEmpty && (mergePattern match {
            case "chapter" => digitLeadP.matcher(nextLine).find()
            case _         => true
          })
          if (shouldMerge) {
            result += s"$line $nextLine"
            idx = nextIdx + 1
          } else {
            result += line
            idx += 1
          }
        } else {
          result += line
          idx += 1
        }
      }
    }
    result.result()
  }

  // ---- parse_toc_entry (toc.py:327-482) -----------------------------------

  private val dotLeaderP = Pattern.compile("\\.{2,}\\s*(\\d+)\\s*$", U)
  private val dashLeaderP = Pattern.compile("[─\\-]{2,}\\s*(\\d+)\\s*$", U)
  private val spaceLeaderP = Pattern.compile("\\s{3,}(\\d+)\\s*$", U)

  private val chapterNewP = Pattern.compile("^Chapter\\s+(\\d+)\\s*(.*)$", Pattern.CASE_INSENSITIVE | U)
  private val sectionNewP = Pattern.compile("^Section\\s+(\\d+\\.\\d+)\\s*(.*)$", Pattern.CASE_INSENSITIVE | U)
  private val subsectionNewP =
    Pattern.compile("^Subsection\\s+(\\d+\\.\\d+\\.\\d+)\\s*(.*)$", Pattern.CASE_INSENSITIVE | U)
  private val level5P = Pattern.compile("^(\\d+\\.\\d+\\.\\d+\\.\\d+\\.\\d+)\\s+(.+)$", U)
  private val level4P = Pattern.compile("^(\\d+\\.\\d+\\.\\d+\\.\\d+)\\s+(.+)$", U)
  private val level3P = Pattern.compile("^(\\d+\\.\\d+\\.\\d+)\\s+(.+)$", U)
  private val level2P = Pattern.compile("^(\\d+\\.\\d+)\\s+(.+)$", U)
  private val level1P = Pattern.compile("^(\\d)\\s+(.+)$", U)

  def parseTocEntry(lineIn: String): Option[TocEntry] = {
    if (Py.strip(lineIn).isEmpty) return None
    var line = lineIn
    var pageNumber = ""
    val dm = dotLeaderP.matcher(line)
    if (dm.find()) { pageNumber = dm.group(1); line = line.substring(0, dm.start()) }
    if (pageNumber.isEmpty) {
      val m = dashLeaderP.matcher(line)
      if (m.find()) { pageNumber = m.group(1); line = line.substring(0, m.start()) }
    }
    if (pageNumber.isEmpty) {
      val m = spaceLeaderP.matcher(line)
      if (m.find()) { pageNumber = m.group(1); line = line.substring(0, m.start()) }
    }
    line = normalizeTocLine(line)

    def entry(text: String, level: Int, number: String) =
      Some(TocEntry(Py.strip(text), level, number, pageNumber))

    val mc = chapterNewP.matcher(line)
    if (mc.matches()) return entry(mc.group(2), 1, mc.group(1))
    val ms = sectionNewP.matcher(line)
    if (ms.matches()) return entry(ms.group(2), 2, ms.group(1))
    val mss = subsectionNewP.matcher(line)
    if (mss.matches()) return entry(mss.group(2), 3, mss.group(1))
    val m5 = level5P.matcher(line)
    if (m5.matches()) return entry(m5.group(2), 5, m5.group(1))
    val m4 = level4P.matcher(line)
    if (m4.matches()) return entry(m4.group(2), 4, m4.group(1))
    val m3 = level3P.matcher(line)
    if (m3.matches()) return entry(m3.group(2), 3, m3.group(1))
    val m2 = level2P.matcher(line)
    if (m2.matches()) return entry(m2.group(2), 2, m2.group(1))
    val m1 = level1P.matcher(line)
    if (m1.matches()) return entry(m1.group(2), 1, m1.group(1))
    if (line.nonEmpty) Some(TocEntry(line, 1, "", pageNumber)) else None
  }

  private val wsRunP = Pattern.compile("\\s+", U)

  /** normalize_toc_text (toc.py:211-240): per-line normalize, space-join,
    * whitespace-collapse. */
  def normalizeTocText(lines: Seq[String]): String =
    Py.strip(wsRunP.matcher(lines.map(normalizeTocLine).mkString(" ")).replaceAll(" "))

  // split_toc_entries (toc.py:243-296): lookahead split on entry starts.
  private val splitP = Pattern.compile(
    "(?=" +
      "(?:Chapter|CHAPTER|chapter)\\s+\\d+|" +
      "(?:Section|SECTION|section)\\s+\\d+\\.\\d+|" +
      "(?:Subsection|SUBSECTION|subsection)\\s+\\d+\\.\\d+\\.\\d+|" +
      "(?:Episode|EPISODE|episode)\\s+\\d+|" +
      "(?:Column|COLUMN|column)\\s+|" +
      "第\\d+章|" +
      "\\d+\\.\\d+\\.\\d+\\s|" +
      "\\d+\\.\\d+\\s|" +
      "(?:^|\\s)\\d+\\s+(?=[^\\d\\.])" +
      ")",
    U
  )

  def splitTocEntries(normalizedText: String): Vector[String] = {
    if (Py.strip(normalizedText).isEmpty) return Vector.empty
    splitP.split(normalizedText, -1).iterator.map(Py.strip).filter(_.nonEmpty).toVector
  }

  /** parse_toc_lines (toc.py:299-323): per-line normalize + parse. */
  def parseTocLines(lines: Seq[String]): Vector[TocEntry] =
    lines.iterator
      .map(Py.strip)
      .filter(_.nonEmpty)
      .flatMap(l => parseTocEntry(normalizeTocLine(l)))
      .toVector
}
