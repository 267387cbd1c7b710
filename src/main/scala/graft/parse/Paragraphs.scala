package graft.parse

import java.util.regex.Pattern
import graft.model.Paragraph
import graft.text.Py

/** Paragraph parsing, faithful to src/book_converter/parser/paragraph.py. */
object Paragraphs {

  private val wsRun = Pattern.compile("\\s+", Pattern.UNICODE_CHARACTER_CLASS)

  /** parse_paragraph (paragraph.py:162-185) — the live page-parse path:
    * join lines with NO delimiter (Japanese), collapse whitespace runs. */
  def parseParagraph(lines: Seq[String]): Option[Paragraph] = {
    if (lines.isEmpty) return None
    val joined = lines.iterator.map(Py.strip).mkString("")
    val text = Py.strip(wsRun.matcher(joined).replaceAll(" "))
    if (text.isEmpty) None else Some(Paragraph(text))
  }

  /** parse_paragraph_lines (paragraph.py:10-42) — space-joined variant
    * (kept because both exist in the reference; only parseParagraph is on
    * the live path via page.py:638). */
  def parseParagraphLines(lines: Seq[String]): Option[Paragraph] = {
    if (lines.isEmpty) return None
    val joined = lines.iterator.map(Py.strip).mkString(" ")
    val text = Py.strip(wsRun.matcher(joined).replaceAll(" "))
    if (text.isEmpty) None else Some(Paragraph(text))
  }

  /** split_paragraphs (paragraph.py:45-95): blank-line separated. */
  def splitParagraphs(text: String): Vector[Paragraph] = {
    if (Py.strip(text).isEmpty) return Vector.empty
    val out = Vector.newBuilder[Paragraph]
    var current = Vector.empty[String]
    text.split("\n", -1).foreach { line =>
      if (Py.strip(line).isEmpty) {
        if (current.nonEmpty) { parseParagraphLines(current).foreach(out += _); current = Vector.empty }
      } else current :+= line
    }
    if (current.nonEmpty) parseParagraphLines(current).foreach(out += _)
    out.result()
  }

  private val terminators = Set('。', '.', '!', '！', '?', '？')

  /** merge_continuation_paragraphs (paragraph.py:97-159) — the
    * hyphenation/line-wrap normalization analog. Faithfully replicates the
    * reference's in-place mutation quirk: a merged paragraph is written
    * back into the list and re-examined on the next step, so chains of
    * unterminated paragraphs collapse into one. */
  def mergeContinuation(paragraphs: Seq[Paragraph]): Vector[Paragraph] = {
    if (paragraphs.isEmpty) return Vector.empty
    if (paragraphs.size == 1) return paragraphs.toVector
    val buf = paragraphs.toArray
    val result = Vector.newBuilder[Paragraph]
    var idx = 0
    while (idx < buf.length) {
      val current = buf(idx)
      val currentText = Py.rstrip(current.text)
      var endsWithTerminator = false
      if (currentText.nonEmpty) {
        val last = currentText.last
        if (terminators.contains(last)) endsWithTerminator = true
        else if (currentText.length >= 2) {
          val lastTwo = currentText.takeRight(2)
          if (lastTwo == "）。" || lastTwo == "」。") endsWithTerminator = true
        }
      }
      if (endsWithTerminator || idx == buf.length - 1) {
        result += current
        idx += 1
      } else {
        val next = buf(idx + 1)
        val mergedText = Py.strip(currentText + next.text)
        buf(idx + 1) = Paragraph(mergedText, current.readAloud)
        idx += 1
      }
    }
    result.result()
  }
}
