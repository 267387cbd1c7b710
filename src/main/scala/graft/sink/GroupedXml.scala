package graft.sink

import scala.collection.mutable
import org.apache.spark.sql.Dataset
import graft.group.Sections
import graft.model.InputDoc
import graft.text.Py

/** The reference's `--group-pages` output path: group_pages_by_toc
  * (/root/reference/src/book_converter/page_grouper/assignment.py:21-135 +
  * hierarchy.py + toc.py + xml.py), byte-for-byte.
  *
  * The reference transforms the SERIALIZED book.xml: it re-parses with
  * ElementTree (which DROPS comments — error comments vanish), splits
  * front-matter (pages up to toc end), forward-fills section assignment
  * from the first content heading / pageMetadata, builds
  * chapter/section/subsection containers from the TOC, then flattens
  * pages into `<!-- page N -->` comments + hoisted content elements with
  * duplicate-heading removal against the container title. We reproduce
  * that transform over the same element tree [[XmlBuilder.buildBookTree]]
  * produces, including the parse round-trip's comment dropping and the
  * reference's own failure mode (int("") on an empty page number raises).
  */
object GroupedXml {

  import XmlBuilder.{CommentNode, El, Node, Tail}

  final class PageValidationException(msg: String) extends RuntimeException(msg)

  // ---- small ET equivalents -------------------------------------------------

  private def attr(e: El, name: String): Option[String] =
    e.attrs.collectFirst { case (k, v) if k == name => v }

  private def findFirst(e: El, tag: String): Option[El] =
    e.children.collectFirst { case c: El if c.tag == tag => c }

  private def findAll(e: El, tag: String): Vector[El] =
    e.children.collect { case c: El if c.tag == tag => c }.toVector

  /** ET itertext(): text + descendant texts + tails, document order.
    * Comments yield nothing (non-string tag in ET). */
  def itertext(e: El): String = {
    val sb = new StringBuilder
    def go(el: El): Unit = {
      el.text.foreach(sb.append)
      el.children.foreach {
        case c: El          => go(c)
        case Tail(t)        => sb.append(t)
        case _: CommentNode => ()
      }
    }
    go(e)
    sb.toString
  }

  private def iterDescendants(e: El, tag: String): Vector[El] = {
    val out = Vector.newBuilder[El]
    def go(el: El): Unit = {
      if (el.tag == tag) out += el
      el.children.foreach { case c: El => go(c); case _ => () }
    }
    e.children.foreach { case c: El => go(c); case _ => () }
    out.result()
  }

  /** ET.fromstring drops comments — the round-trip the reference's
    * group_pages path performs on build_xml_with_errors output. */
  def dropComments(e: El): El = {
    val out = new El(e.tag)
    out.attrs ++= e.attrs
    out.text = e.text
    e.children.foreach {
      case c: El          => out.append(dropComments(c))
      case t: Tail        => out.append(t)
      case _: CommentNode => ()
    }
    out
  }

  // ---- toc.py ---------------------------------------------------------------

  final case class TocXmlEntry(level: Int, number: String, title: String)

  /** _normalize_level (toc.py:31-51). */
  private def normalizeLevel(level: String): Int =
    if (level.nonEmpty && level.forall(_.isDigit)) math.min(Py.toInt(level), 3)
    else Map("chapter" -> 1, "section" -> 2, "subsection" -> 3, "other" -> 1)
      .getOrElse(level, 1)

  /** parse_toc (toc.py:54-75): level inferred from the number's
    * trailing-zero convention, falling back to the level attribute. */
  def parseToc(tocEl: El): Vector[TocXmlEntry] =
    findAll(tocEl, "entry").map { e =>
      val number = attr(e, "number").getOrElse("")
      val title = attr(e, "title").getOrElse("")
      val inferred = Sections.parseSectionNumber(number)
        .map(sn => math.min(sn.effectiveParts.length, 3))
      TocXmlEntry(inferred.getOrElse(normalizeLevel(attr(e, "level").getOrElse(""))),
        number, title)
    }

  /** validate_page_count (toc.py:78-100): raises below 50% survival. */
  private def validatePageCount(inputCount: Int, outputCount: Int): Unit = {
    if (inputCount == 0) return
    val lossRatio = (inputCount - outputCount).toDouble / inputCount
    if (lossRatio >= 0.5)
      throw new PageValidationException(
        f"Page validation failed: $outputCount of $inputCount pages preserved " +
          f"(${(1 - lossRatio) * 100}%.1f%%). At least 50%% required.")
  }

  // ---- assignment.py (XML variants — the live path) -------------------------

  /** _extract_section_from_page (assignment.py:177-230): FIRST content
    * heading only (new-format Chapter/Section/Subsection regexes, then the
    * legacy fallback), then pageMetadata. */
  private def extractSectionFromPage(page: El,
      config: Option[Sections.HeaderLevelConfig]): Option[String] = {
    for (content <- findFirst(page, "content"); heading <- findFirst(content, "heading")) {
      val headingText = Py.strip(itertext(heading))
      val sec = Sections.extractSectionFromHeading(headingText, config)
      if (sec.isDefined) return sec
    }
    findFirst(page, "pageMetadata").flatMap { md =>
      extractSectionFromPageMetadata(itertext(md), config)
    }
  }

  /** extract_section_from_page_metadata (section.py:101-148). */
  private def extractSectionFromPageMetadata(metadataIn: String,
      config: Option[Sections.HeaderLevelConfig]): Option[String] =
    Sections.extractSectionFromMetadata(metadataIn, config)

  // ---- section.py is_chapter_title_page -------------------------------------

  // python \d matches Unicode Nd (full-width １２３ included) -> \d + U flag
  private val chapterTitleP = java.util.regex.Pattern.compile("第\\d+章",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** is_chapter_title_page (section.py:199-234): 第N章 at the START of
    * pageMetadata text or of any content heading — the reference pattern
    * is re.search(r"^第\\d+章"), which without MULTILINE only matches at
    * position 0, i.e. lookingAt. If the SERIALIZED metadata contains the
    * literal "<emphasis>", the reference returns False for the WHOLE page
    * (section.py:219-220) — not just for the metadata check. */
  private def isChapterTitlePage(page: El): Boolean = {
    findFirst(page, "pageMetadata") match {
      case Some(md) =>
        if (XmlBuilder.fragment(md).contains("<emphasis>")) return false
        if (chapterTitleP.matcher(itertext(md)).lookingAt()) return true
      case None => ()
    }
    findFirst(page, "content").foreach { content =>
      iterDescendants(content, "heading").foreach { h =>
        val text = if (h.text.exists(_.nonEmpty) || h.children.nonEmpty) itertext(h) else ""
        if (chapterTitleP.matcher(text).lookingAt()) return true
      }
    }
    false
  }

  // ---- hierarchy.py ----------------------------------------------------------

  private def sortKey(num: String): Vector[Int] = num.split("\\.").map(Py.toInt).toVector
  private implicit val vecOrd: Ordering[Vector[Int]] =
    Ordering.Implicits.seqOrdering[Vector, Int]

  /** _build_hierarchical_structure (hierarchy.py:82-137). */
  private def buildHierarchicalStructure(bookElem: El,
      pageAssignments: mutable.LinkedHashMap[String, mutable.ArrayBuffer[El]],
      tocLookup: mutable.LinkedHashMap[String, TocXmlEntry]): Unit = {
    val chapters =
      mutable.LinkedHashMap.empty[Int, mutable.LinkedHashMap[String, mutable.ArrayBuffer[El]]]
    pageAssignments.foreach { case (sectionNum, pages) =>
      Sections.parseSectionNumber(sectionNum).foreach { sn =>
        chapters.getOrElseUpdate(sn.chapterNum, mutable.LinkedHashMap.empty)
          .update(sectionNum, pages)
      }
    }
    val keys = tocLookup.keySet.toSet
    chapters.keys.toVector.sorted.foreach { chNum =>
      val chapterKey = Sections.findTocKey(chNum.toString, keys)
      chapterKey.flatMap(tocLookup.get).foreach { entry =>
        val chapterElem = new El("chapter")
        chapterElem.set("number", chapterKey.get)
        chapterElem.set("title", entry.title)
        addSectionsToChapter(chapterElem, chapters(chNum), tocLookup)
        bookElem.append(chapterElem)
      }
    }
    // TOC chapters with no pages (existing set is FIXED — two TOC chapter
    // keys with the same chapter number both append, like the reference)
    val existing = chapters.keySet.toSet
    tocLookup.foreach { case (num, entry) =>
      Sections.parseSectionNumber(num).foreach { sn =>
        if (sn.isChapter && !existing.contains(sn.chapterNum)) {
          val chapterElem = new El("chapter")
          chapterElem.set("number", num)
          chapterElem.set("title", entry.title)
          bookElem.append(chapterElem)
        }
      }
    }
  }

  /** _add_sections_to_chapter (hierarchy.py:140-219). */
  private def addSectionsToChapter(chapterElem: El,
      sections: mutable.LinkedHashMap[String, mutable.ArrayBuffer[El]],
      tocLookup: mutable.LinkedHashMap[String, TocXmlEntry]): Unit = {
    val keys = tocLookup.keySet.toSet
    val sectionMap =
      mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, mutable.ArrayBuffer[El]]]
    sections.foreach { case (sectionNum, pages) =>
      Sections.parseSectionNumber(sectionNum).foreach { sn =>
        if (sn.isChapter) {
          pages.foreach { page =>
            if (isChapterTitlePage(page)) page.set("type", "chapter-title")
            chapterElem.append(page)
          }
        } else if (sn.isSection) {
          sectionMap.getOrElseUpdate(sectionNum, mutable.LinkedHashMap.empty)
            .update("_pages", pages)
        } else if (sn.isSubsection) {
          val parentEffective = sn.effectiveParts.take(2).mkString(".")
          val parentKey = Sections.findTocKey(parentEffective, keys).getOrElse(parentEffective)
          sectionMap.getOrElseUpdate(parentKey, mutable.LinkedHashMap.empty)
            .update(sectionNum, pages)
        }
      }
    }
    sectionMap.keys.toVector.sortBy(sortKey).foreach { sectionNum =>
      val sectionKey = Sections.findTocKey(sectionNum, keys)
      sectionKey.flatMap(tocLookup.get).foreach { entry =>
        val sectionElem = new El("section")
        sectionElem.set("number", sectionNum)
        sectionElem.set("title", entry.title)
        sectionMap(sectionNum).get("_pages").foreach(_.foreach(sectionElem.append))
        sectionMap(sectionNum).foreach { case (subNum, pages) =>
          if (subNum != "_pages") {
            Sections.findTocKey(subNum, keys).flatMap(tocLookup.get).foreach { subEntry =>
              val subElem = new El("subsection")
              subElem.set("number", subNum)
              subElem.set("title", subEntry.title)
              pages.foreach(subElem.append)
              sectionElem.append(subElem)
            }
          }
        }
        chapterElem.append(sectionElem)
      }
    }
  }

  /** _flatten_pages_in_element (hierarchy.py:232-316): page -> comment +
    * hoisted content children; announcement/metadata dropped; duplicate
    * headings vs the container title removed. In-place, recursive. */
  private def flatten(element: El, containerNumber: Option[String],
      containerTitle: String): (Int, Int) = {
    var pagesFlattened = 0
    var headingsRemoved = 0
    val pages = findAll(element, "page")
    pages.foreach { page =>
      val pageNumber = attr(page, "number").getOrElse("")
      var idx = element.children.indexWhere(_.asInstanceOf[AnyRef] eq page)
      element.children.remove(idx)
      if (pageNumber.nonEmpty) {
        element.children.insert(idx, CommentNode(s" page $pageNumber "))
        idx += 1
      }
      page.children.foreach {
        case c: El if c.tag == "pageAnnouncement" || c.tag == "pageMetadata" => ()
        case c: El if c.tag == "content" =>
          c.children.foreach {
            case h: El if h.tag == "heading" && containerTitle.nonEmpty &&
                Sections.isDuplicateHeading(itertext(h), containerNumber, containerTitle) =>
              headingsRemoved += 1
            case child =>
              element.children.insert(idx, child)
              idx += 1
          }
        case other =>
          element.children.insert(idx, other)
          idx += 1
      }
      pagesFlattened += 1
    }
    element.children.foreach {
      case c: El if Set("chapter", "section", "subsection", "front-matter").contains(c.tag) =>
        val (p, h) = flatten(c, attr(c, "number"), attr(c, "title").getOrElse(""))
        pagesFlattened += p
        headingsRemoved += h
      case _ => ()
    }
    (pagesFlattened, headingsRemoved)
  }

  // ---- the top-level transform (assignment.py:21-135) -----------------------

  /** group_pages_by_toc over an element tree (post comment-dropping). */
  def groupPagesByToc(root: El,
      config: Option[Sections.HeaderLevelConfig] = None): El = {
    val metadata = findFirst(root, "metadata")
    val tocElement = findFirst(root, "toc")
    val tocEntries = tocElement.map(parseToc).getOrElse(Vector.empty)
    // int(toc.get("begin", "0")) — absent attr defaults "0"; an EMPTY
    // page number attr raises like the reference's int("")
    val tocBegin = tocElement.map(t => Py.toInt(attr(t, "begin").getOrElse("0"))).getOrElse(0)
    val tocEnd = tocElement.map(t => Py.toInt(attr(t, "end").getOrElse("0"))).getOrElse(0)

    val tocLookup = mutable.LinkedHashMap.empty[String, TocXmlEntry]
    tocEntries.foreach(e => if (e.number.nonEmpty) tocLookup.update(e.number, e))

    val newBook = new El("book")
    metadata.foreach(newBook.append)
    tocElement.foreach(newBook.append)

    val pages = findAll(root, "page")
    if (tocEntries.isEmpty) {
      val frontMatter = new El("front-matter")
      pages.foreach(frontMatter.append)
      newBook.append(frontMatter)
    } else {
      val (frontPages, contentPages) = pages.partition { page =>
        val pageNum = Py.toInt(attr(page, "number").getOrElse("0")) // int("") raises
        tocBegin != 0 && pageNum <= tocEnd
      }
      if (frontPages.nonEmpty) {
        val frontMatter = new El("front-matter")
        frontPages.foreach(frontMatter.append)
        newBook.append(frontMatter)
      }
      // _assign_pages_to_sections (assignment.py:138-174)
      val assignments = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[El]]
      var current: Option[String] = None
      contentPages.foreach { page =>
        val sectionNum = extractSectionFromPage(page, config)
        sectionNum match {
          case Some(s) if tocLookup.contains(s) => current = Some(s)
          case _ if current.isEmpty =>
            current = Sections.findFirstChapter(tocLookup.keys)
          case _ => ()
        }
        current.foreach(c =>
          assignments.getOrElseUpdate(c, mutable.ArrayBuffer.empty) += page)
      }
      buildHierarchicalStructure(newBook, assignments, tocLookup)
    }

    validatePageCount(pages.length, iterDescendants(newBook, "page").length)
    flatten(newBook, None, "")
    newBook
  }

  /** Full grouped sink for one doc: build_xml_with_errors -> (parse
    * round-trip: comments dropped) -> group_pages_by_toc -> serialize. */
  def buildGroupedXml(doc: InputDoc, runningHeadThreshold: Double = 0.5,
      config: Option[Sections.HeaderLevelConfig] = None): String = {
    val root = dropComments(XmlBuilder.buildBookTree(doc, runningHeadThreshold))
    val grouped = groupPagesByToc(root, config)
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" + XmlBuilder.fragment(grouped)
  }

  /** Distributed grouped sink (narrow map, one XML per doc). */
  def xml(docs: Dataset[InputDoc], runningHeadThreshold: Double = 0.5)
      : Dataset[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map(d => (d.doc_id, buildGroupedXml(d, runningHeadThreshold))))
  }
}
