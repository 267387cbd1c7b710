package graft.text

/** Python-compatible string primitives.
  *
  * The reference is Python; its `str.strip()` / `\s` semantics cover
  * unicode whitespace (U+3000 ideographic space, NBSP, ...) that Java's
  * `String.trim` / ASCII `\s` do not. Centralised here so every operator
  * matches the reference bit-for-bit on Japanese text.
  */
object Py {

  /** Python str.isspace()-equivalent per char (unicode whitespace).
    * Character.isWhitespace covers U+3000 but excludes non-breaking
    * spaces, which Python treats as whitespace. */
  def isSpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == 0x00a0.toChar || c == 0x2007.toChar ||
      c == 0x202f.toChar || c == 0x0085.toChar

  /** Python str.strip() (no args). */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  def lstrip(s: String): String = {
    var i = 0
    while (i < s.length && isSpace(s.charAt(i))) i += 1
    if (i == 0) s else s.substring(i)
  }

  def rstrip(s: String): String = {
    var j = s.length
    while (j > 0 && isSpace(s.charAt(j - 1))) j -= 1
    if (j == s.length) s else s.substring(0, j)
  }

  /** Python str.isalnum() per CODE POINT: isalpha (L*) or isdecimal/
    * isdigit/isnumeric — which adds Nl (Ⅷ) and No (①, ², ½) beyond
    * Java's isLetterOrDigit. Circled list numbers are common in the
    * reference's OCR text, so the wider set is observable. */
  def isAlnum(cp: Int): Boolean = {
    if (Character.isLetter(cp) || Character.isDigit(cp)) true
    else {
      val t = Character.getType(cp)
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }
  }
  def isAlnum(c: Char): Boolean = isAlnum(c.toInt)

  /** Code points of a string (python strings are code-point sequences). */
  def codePoints(s: String): Array[Int] = s.codePoints().toArray

  /** Python len(str) = code-point count. */
  def len(s: String): Int = s.codePointCount(0, s.length)

  /** Python int(str): accepts any Unicode Nd digits (full-width
    * １２３ included) with surrounding whitespace; raises on anything
    * else — the exact semantics of int() on regex-captured \\d groups.
    * Character.digit handles Nd -> value per char. */
  def toInt(sIn: String): Int = {
    val s = strip(sIn)
    if (s.isEmpty) throw new NumberFormatException(s"invalid literal for int(): '$sIn'")
    var i = 0
    var neg = false
    if (s.charAt(0) == '+' || s.charAt(0) == '-') { neg = s.charAt(0) == '-'; i = 1 }
    if (i >= s.length) throw new NumberFormatException(s"invalid literal for int(): '$sIn'")
    var out = 0L
    while (i < s.length) {
      val d = Character.digit(s.charAt(i), 10)
      if (d < 0) throw new NumberFormatException(s"invalid literal for int(): '$sIn'")
      out = out * 10 + d
      if (out > Int.MaxValue) throw new NumberFormatException(s"int overflow: '$sIn'")
      i += 1
    }
    if (neg) -out.toInt else out.toInt
  }
}
