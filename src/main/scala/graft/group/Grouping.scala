package graft.group

import graft.model._

/** Page grouping: section extraction from page content, forward-fill
  * assignment, hierarchy keys, duplicate-heading removal, page-count
  * validation — the span-level re-expression of the reference's
  * group_pages_by_toc (src/book_converter/page_grouper/assignment.py:21-
  * 288, toc.py:77-100, hierarchy.py).
  *
  * The reference transforms XML; here grouping annotates each page with
  * its (chapter, section) keys so downstream spans carry the hierarchy as
  * columns — the Catalyst-friendly shape (grouping keys, not nested
  * containers, SURVEY §1.1).
  */
object Grouping {

  /** _extract_section_from_page_content (assignment.py:271-288): first
    * heading or paragraph whose text yields a section number. */
  def extractSectionFromPage(page: ParsedPage): Option[String] = {
    page.elements.iterator.flatMap {
      case Heading(_, text, _)  => Sections.extractSectionFromText(text)
      case Paragraph(text, _)   => Sections.extractSectionFromText(text)
      case _                    => None
    }.nextOption()
  }

  /** _infer_level_from_number (page_grouper/toc.py:13-28). */
  def inferLevelFromNumber(number: String): Option[Int] =
    Sections.parseSectionNumber(number).map(sn => math.min(sn.effectiveParts.length, 3))

  /** _assign_pages_to_sections_new (assignment.py:232-269): forward fill;
    * pages before the first section go to the numerically first chapter;
    * pages with no assignment at all (empty TOC) are dropped, like the
    * reference's `if current_section` guard. Returns per-page assigned
    * section key (None = dropped). */
  def assignPages(pages: Seq[ParsedPage], tocKeys: Set[String]): Vector[Option[String]] = {
    var current: Option[String] = None
    pages.map { page =>
      val sectionNum = extractSectionFromPage(page)
      sectionNum match {
        case Some(s) if tocKeys.contains(s) => current = Some(s)
        case _ if current.isEmpty           => current = Sections.findFirstChapter(tocKeys)
        case _                              =>
      }
      current
    }.toVector
  }

  final case class PageGroup(
      pageIdx: Int,
      sectionKey: String, // assigned TOC key
      chapterNum: Int, // SectionNumber.chapterNum of the key
      level: Int // inferred hierarchy level of the key
  )

  /** Full grouping: pages -> (assigned key, chapter, level) rows, dropping
    * unassignable pages. Chapter grouping = chapterNum; section sort =
    * numeric tuple (hierarchy.py:220-229). */
  def groupPages(pages: Seq[ParsedPage], toc: Seq[TocEntry]): Vector[PageGroup] = {
    val tocKeys = toc.filter(_.number.nonEmpty).map(_.number).toSet
    val assigned = assignPages(pages, tocKeys)
    assigned.zipWithIndex.collect { case (Some(key), idx) =>
      val sn = Sections.parseSectionNumber(key)
      PageGroup(idx, key, sn.map(_.chapterNum).getOrElse(0),
        inferLevelFromNumber(key).getOrElse(1))
    }
  }

  /** Remove headings duplicating their container's title
    * (hierarchy.py:282-288 + transformer_utils.py:46-77). */
  def removeDuplicateHeadings(elements: Seq[Element], containerNumber: Option[String],
      containerTitle: String): Vector[Element] =
    elements.filterNot {
      case Heading(_, text, _) =>
        Sections.isDuplicateHeading(text, containerNumber, containerTitle)
      case _ => false
    }.toVector

  /** validate_page_count (page_grouper/toc.py:77-100): >= 50% of input
    * pages must survive grouping. */
  def validatePageCount(inputCount: Int, outputCount: Int): Either[String, Unit] = {
    if (inputCount == 0) return Right(())
    val lossRatio = (inputCount - outputCount).toDouble / inputCount
    if (lossRatio >= 0.5)
      Left(f"Page validation failed: $outputCount of $inputCount pages preserved " +
        f"(${(1 - lossRatio) * 100}%.1f%%). At least 50%% required.")
    else Right(())
  }
}
