package graft.group

import java.util.regex.Pattern
import graft.model.TocEntry

/** Section-number parsing, page->section assignment (forward fill),
  * TOC-key zero-pad lookup, and duplicate-heading detection.
  * Faithful ports of src/book_converter/page_grouper/{models,section,
  * assignment,hierarchy}.py and transformer_utils.py:13-77.
  */
object Sections {

  /** SectionNumber (page_grouper/models.py:22-59): trailing zeros encode
    * the level convention 1.0.0=chapter, 1.1.0=section. */
  final case class SectionNumber(raw: String, parts: Vector[Int], level: Int) {
    def chapterNum: Int = parts.head
    def effectiveParts: Vector[Int] = {
      var p = parts
      while (p.length > 1 && p.last == 0) p = p.init
      p
    }
    def isChapter: Boolean = effectiveParts.length == 1
    def isSection: Boolean = effectiveParts.length == 2
    def isSubsection: Boolean = effectiveParts.length >= 3
  }

  private val U = Pattern.UNICODE_CHARACTER_CLASS
  private val sectionNumP = Pattern.compile("^\\d+(?:\\.\\d+)*$", U)

  /** parse_section_number (section.py:13-39). */
  def parseSectionNumber(s: String): Option[SectionNumber] = {
    if (s == null || s.isEmpty || !sectionNumP.matcher(s).matches()) return None
    val parts = s.split("\\.").map(graft.text.Py.toInt).toVector
    val level = math.min(parts.length, 3)
    Some(SectionNumber(s, parts, level))
  }

  private val wsRun = Pattern.compile("\\s+", U)

  /** normalize_for_matching (section.py:42-65). */
  def normalizeForMatching(text: String): String =
    graft.text.Py.strip(wsRun.matcher(text).replaceAll(" "))

  /** HeaderLevelConfig (models.py:228-284): CLI keyword->level mapping
    * for section extraction (e.g. level1=("chapter"), level2=("episode",
    * "column")). When ANY level is configured, keyword extraction fully
    * REPLACES the fallback patterns (section.py:121-123,169-171). */
  final case class HeaderLevelConfig(
      level1: Vector[String] = Vector.empty,
      level2: Vector[String] = Vector.empty,
      level3: Vector[String] = Vector.empty,
      level4: Vector[String] = Vector.empty,
      level5: Vector[String] = Vector.empty) {
    def keywordsForLevel(level: Int): Vector[String] = level match {
      case 1 => level1; case 2 => level2; case 3 => level3
      case 4 => level4; case 5 => level5; case _ => Vector.empty
    }
    def hasAnyConfig: Boolean =
      level1.nonEmpty || level2.nonEmpty || level3.nonEmpty ||
        level4.nonEmpty || level5.nonEmpty
    // the config is fixed per run but consulted per page — keyword
    // patterns compile once here, not per extraction (lazy val is
    // recomputed after task deserialization, which is per-executor)
    @transient lazy val compiledPatterns: Vector[Pattern] =
      (1 to 5).toVector.flatMap(keywordsForLevel).map(keyword =>
        Pattern.compile("^" + Pattern.quote(keyword) + "\\s*(\\d+)",
          Pattern.CASE_INSENSITIVE | U))
  }

  /** _extract_number_by_keyword (section.py:69-95): "Keyword N" with
    * leading zeros stripped ("Episode 07" -> "7"; all-zero -> "0").
    * Search order is level 1..5 then keyword order, like the reference. */
  def extractNumberByKeyword(text: String, config: HeaderLevelConfig): Option[String] = {
    if (!config.hasAnyConfig) return None
    config.compiledPatterns.iterator.flatMap { p =>
      val m = p.matcher(text)
      if (m.lookingAt()) {
        val stripped = m.group(1).dropWhile(_ == '0')
        Some(if (stripped.isEmpty) "0" else stripped)
      } else None
    }.nextOption()
  }

  private val directSectionP = Pattern.compile("^(\\d+(?:\\.\\d+)+)\\s+", U)
  private val chapterNumP = Pattern.compile("^(\\d+)\\s+(?![/\\d])", U)
  private val jpChapterP = Pattern.compile("^第(\\d+)章", U)
  private val keywordNumP =
    Pattern.compile("^(?:Section|Chapter|Episode|Part)\\s+(\\d+(?:\\.\\d+)*)",
      Pattern.CASE_INSENSITIVE | U)
  private val newChapterP = Pattern.compile("^Chapter\\s+(\\d+)", Pattern.CASE_INSENSITIVE | U)
  private val newSectionP = Pattern.compile("^Section\\s+(\\d+\\.\\d+)", Pattern.CASE_INSENSITIVE | U)
  private val newSubsectionP =
    Pattern.compile("^Subsection\\s+(\\d+\\.\\d+\\.\\d+)", Pattern.CASE_INSENSITIVE | U)

  /** extract_section_from_heading (section.py:150-196): keyword config,
    * when present, replaces the fallback chain entirely. */
  def extractSectionFromText(textIn: String,
      config: Option[HeaderLevelConfig] = None): Option[String] = {
    if (textIn == null || textIn.isEmpty) return None
    val text = normalizeForMatching(textIn)
    config.filter(_.hasAnyConfig) match {
      case Some(c) => return extractNumberByKeyword(text, c)
      case None    => ()
    }
    val m1 = directSectionP.matcher(text)
    if (m1.lookingAt()) return Some(m1.group(1))
    val m2 = chapterNumP.matcher(text)
    if (m2.lookingAt()) return Some(m2.group(1))
    val m3 = jpChapterP.matcher(text)
    if (m3.lookingAt()) return Some(m3.group(1))
    val m4 = keywordNumP.matcher(text)
    if (m4.lookingAt()) return Some(m4.group(1))
    None
  }

  /** extract_section_from_page_metadata (section.py:101-148): whitespace
    * normalization, then the <emphasis> front-matter veto, then the same
    * chain as extract_section_from_heading. */
  def extractSectionFromMetadata(metadataIn: String,
      config: Option[HeaderLevelConfig] = None): Option[String] = {
    if (metadataIn == null || metadataIn.isEmpty) return None
    val metadata = normalizeForMatching(metadataIn)
    if (metadata.contains("<emphasis>")) return None
    extractSectionFromText(metadata, config)
  }

  /** _extract_section_from_page new-format chain (assignment.py:177-230):
    * Chapter N / Section N.N / Subsection N.N.N first (regardless of
    * config), then the legacy (config-aware) fallback. */
  def extractSectionFromHeading(headingText: String,
      config: Option[HeaderLevelConfig] = None): Option[String] = {
    if (headingText == null) return None
    val t = graft.text.Py.strip(headingText)
    val mc = newChapterP.matcher(t)
    if (mc.lookingAt()) return Some(mc.group(1))
    val ms = newSectionP.matcher(t)
    if (ms.lookingAt()) return Some(ms.group(1))
    val mss = newSubsectionP.matcher(t)
    if (mss.lookingAt()) return Some(mss.group(1))
    extractSectionFromText(t, config)
  }

  /** _find_toc_key (hierarchy.py:22-44): zero-pad fallback
    * "1" -> "1.0" -> "1.0.0". */
  def findTocKey(number: String, tocKeys: Set[String]): Option[String] = {
    if (tocKeys.contains(number)) return Some(number)
    var padded = number
    var i = 0
    while (i < 3) {
      padded = s"$padded.0"
      if (tocKeys.contains(padded)) return Some(padded)
      i += 1
    }
    None
  }

  /** _find_first_chapter (hierarchy.py:47-67): numerically smallest
    * chapter key. */
  def findFirstChapter(tocKeys: Iterable[String]): Option[String] = {
    val chapters = tocKeys.flatMap { num =>
      parseSectionNumber(num).filter(_.isChapter).map(sn => (sn.chapterNum, num))
    }
    if (chapters.isEmpty) None else Some(chapters.minBy(_._1)._2)
  }

  /** _assign_pages_to_sections (assignment.py:138-174): forward-fill the
    * current section across pages; first pages default to the first
    * chapter. Input: per page, the extracted section number (if any).
    * Output: per page, the assigned section key (or None). */
  def assignPagesToSections(
      pageSections: Seq[Option[String]],
      tocKeys: Set[String]
  ): Vector[Option[String]] = {
    var current: Option[String] = None
    pageSections.map { sec =>
      sec match {
        case Some(s) if tocKeys.contains(s) => current = Some(s)
        case _ if current.isEmpty           => current = findFirstChapter(tocKeys)
        case _                              =>
      }
      current
    }.toVector
  }

  /** _section_sort_key (hierarchy.py:220-229): numeric tuple sort. */
  def sectionSortKey(sectionNum: String): Vector[Int] =
    parseSectionNumber(sectionNum).map(_.parts).getOrElse(Vector(Int.MaxValue))

  // ---- duplicate-heading detection (transformer_utils.py:13-77) ----------

  private val chapterPrefixP = Pattern.compile("^[Cc][Hh][Aa][Pp][Tt][Ee][Rr]\\s+(\\d+)\\s*", U)
  private val sectionPrefixP = Pattern.compile("^[Ss][Ee][Cc][Tt][Ii][Oo][Nn]\\s+(\\d+\\.\\d+)\\s*", U)

  /** normalize_heading_for_comparison. */
  def normalizeHeadingForComparison(headingText: String): String = {
    var text = chapterPrefixP.matcher(headingText).replaceFirst("$1 ")
    text = sectionPrefixP.matcher(text).replaceFirst("$1 ")
    graft.text.Py.strip(wsRun.matcher(text).replaceAll(" "))
  }

  /** is_duplicate_heading: heading == "{number} {title}" of its container. */
  def isDuplicateHeading(headingText: String, containerNumber: Option[String],
      containerTitle: String): Boolean = {
    val normalized = normalizeHeadingForComparison(headingText)
    val expected = containerNumber match {
      case Some(n) if n.nonEmpty => s"$n $containerTitle"
      case _                     => containerTitle
    }
    normalized == expected
  }

  /** _heading_level_from_number (normalization_rules.py:16-28):
    * N.0.0 -> 1, trailing-zero -> 2, else 3; empty -> 2. */
  def headingLevelFromNumber(number: String): Int = {
    if (number == null || number.isEmpty) return 2
    val parts = number.split("\\.")
    if (parts.length == 3 && parts(1) == "0" && parts(2) == "0") 1
    else if (parts.length >= 2 && parts.last == "0") 2
    else 3
  }

  /** TOC lookup map builder (assignment.py:54). */
  def tocLookup(entries: Seq[TocEntry]): Map[String, TocEntry] =
    entries.filter(_.number.nonEmpty).map(e => e.number -> e).toMap
}
