package graft.text

import java.util.regex.Pattern

/** Text normalizers, faithful to the reference semantics.
  * ref: src/book_converter/analyzer.py:16-38 (dash fold),
  *      src/book_converter/parser/heading_normalizer.py:47-148.
  */
object Normalize {

  /** em dash, en dash, horizontal bar, hyphen, minus, katakana dash,
    * fullwidth hyphen (analyzer.py:16-17). */
  val DashChars = "—–―‐−ー－"

  /** normalize_text (analyzer.py:21-38): fold dash variants to '-'. */
  def dashes(text: String): String = {
    if (text == null || text.isEmpty) return text
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      sb.append(if (DashChars.indexOf(c.toInt) >= 0) '-' else c)
      i += 1
    }
    sb.toString
  }

  private val fullWidthDigits = "０１２３４５６７８９"

  // U flag: the reference pre-translates only FULL-WIDTH digits to ascii,
  // but its \d still matches every other Unicode Nd digit (e.g. ٣-٤)
  private val numberPattern = Pattern.compile("(\\d+)([-・\\.])\\d+(?:[-・\\.]\\d+)*",
    Pattern.UNICODE_CHARACTER_CLASS)

  /** normalize_number_format (heading_normalizer.py:47-91):
    * full-width digits -> ASCII; full-width dot -> '.'; separators
    * -/・/. inside digit runs -> '.' (text hyphens like "SRE-based"
    * untouched because the pattern requires digits on both sides). */
  def numberFormat(text: String): String = {
    if (text == null || text.isEmpty) return text
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val fw = fullWidthDigits.indexOf(c.toInt)
      sb.append(if (fw >= 0) ('0' + fw).toChar else if (c == '．') '.' else c)
      i += 1
    }
    val half = sb.toString
    val m = numberPattern.matcher(half)
    val out = new StringBuilder
    var last = 0
    while (m.find()) {
      out.append(half.substring(last, m.start()))
      out.append(m.group(0).replace('-', '.').replace('・', '.'))
      last = m.end()
    }
    out.append(half.substring(last))
    out.toString
  }

  // (?U): Python \s matches unicode whitespace (full-width space U+3000);
  // digits stay ASCII (\\d) — full-width digits in structural numbers
  // are normalized by numberFormat first, mirroring the reference flow.
  private val zenSpacePattern =
    Pattern.compile("第\\s+(\\d+)\\s+(章|節)", Pattern.UNICODE_CHARACTER_CLASS)
  private val numSpacePattern =
    Pattern.compile("(\\d+)\\.\\s+(\\d+)", Pattern.UNICODE_CHARACTER_CLASS)

  /** normalize_spaces (heading_normalizer.py:94-125): 第 N 章 -> 第N章;
    * iterate "N. N" -> "N.N" to fixpoint. */
  def spaces(text: String): String = {
    if (text == null || text.isEmpty) return text
    var result = zenSpacePattern.matcher(text).replaceAll("第$1$2")
    var done = false
    while (!done) {
      val next = numSpacePattern.matcher(result).replaceAll("$1.$2")
      if (next == result) done = true else result = next
    }
    result
  }

  private val specialMarkers = Set('■', '◆', '□', '●', '◇', '▲')

  /** is_special_marker (heading_normalizer.py:128-148). */
  def isSpecialMarker(text: String): Boolean = {
    if (text == null || text.isEmpty) return false
    val stripped = Py.lstrip(text)
    stripped.nonEmpty && specialMarkers.contains(stripped.charAt(0))
  }
}
