package graft.parse

import scala.collection.mutable
import graft.model._
import graft.text.Py

/** Page-splitting + single-page content parse.
  * Faithful port of src/book_converter/parser/page.py:270-647:
  *  - the line scan that splits the document at page markers,
  *  - per-page element parse (headings, figures, metadata, lists,
  *    paragraphs) with the toc/content/skip marker stack that PERSISTS
  *    across page boundaries (page.py:529, SURVEY §2.9),
  *  - TOC line collection and page-range tracking.
  *
  * Pure sequential fold over one document's lines: runs inside one task
  * per doc (mapPartitions), never distributed within a doc.
  */
object PageParser {

  final case class ParseOutput(
      pages: Vector[ParsedPage],
      errors: Vector[ConvError],
      tocEntries: Vector[TocEntry],
      tocBeginPage: String,
      tocEndPage: String
  )

  /** parse_pages_with_errors (page.py:269-340). */
  def parseDocument(lines: IndexedSeq[String]): ParseOutput = {
    val pages = Vector.newBuilder[ParsedPage]
    val errors = Vector.newBuilder[ConvError]
    val allToc = Vector.newBuilder[TocEntry]
    var tocBegin = ""
    var tocEnd = ""
    val markerStack = mutable.Stack.empty[String]

    var curNumber = ""
    var curSource = ""
    var curLines = Vector.newBuilder[String]
    var lastMarkerLine = 0
    var pageStartLine = 0

    def processAndSave(): Unit = {
      if (curSource.isEmpty) return
      val (page, pageErrors, tocEntries, hadToc) =
        parseSinglePage(curNumber, curSource, curLines.result(), pageStartLine, markerStack)
      pages += page
      errors ++= pageErrors
      if (hadToc && curNumber.nonEmpty) {
        if (tocBegin.isEmpty) tocBegin = curNumber
        tocEnd = curNumber
        allToc ++= tocEntries
      }
      if (curNumber.isEmpty)
        errors += ConvError("PAGE_NUMBER_NOT_FOUND", "ページ番号が見つかりません", "", lastMarkerLine)
    }

    var lineIdx = 1
    lines.foreach { line =>
      val (pageNum, sourceFile) = Markers.extractPageNumber(line)
      if (pageNum.nonEmpty || sourceFile.nonEmpty) {
        processAndSave()
        curNumber = pageNum
        curSource = sourceFile
        curLines = Vector.newBuilder[String]
        lastMarkerLine = lineIdx
        pageStartLine = lineIdx
      } else {
        curLines += line
      }
      lineIdx += 1
    }
    processAndSave()

    ParseOutput(pages.result(), errors.result(), allToc.result(), tocBegin, tocEnd)
  }

  /** _parse_single_page_content (page.py:515-647). markerStack is mutated
    * in place and persists across pages (reference quirk, observable). */
  def parseSinglePage(
      pageNumber: String,
      sourceFile: String,
      lines: IndexedSeq[String],
      startLine: Int,
      markerStack: mutable.Stack[String]
  ): (ParsedPage, Vector[ConvError], Vector[TocEntry], Boolean) = {
    val elements = Vector.newBuilder[Element]
    val figures = Vector.newBuilder[Figure]
    var metadata: Option[PageMeta] = None
    val tocEntries = Vector.newBuilder[TocEntry]
    val errors = Vector.newBuilder[ConvError]
    var inToc = false
    var hadTocMarker = false
    var tocLines = Vector.newBuilder[String]
    val cache = new LineCache(lines)

    def stackList: List[String] = markerStack.toList // head == top

    var idx = 0
    while (idx < lines.length) {
      val line = lines(idx)
      val lineNum = startLine + idx + 1
      var consumed = false

      Markers.parseTocMarker(line) match {
        case Some(Markers.TocStart) =>
          inToc = true; hadTocMarker = true; tocLines = Vector.newBuilder[String]
          idx += 1; consumed = true
        case Some(Markers.TocEnd) =>
          val collected = tocLines.result()
          if (collected.nonEmpty) tocEntries ++= TocParse.parseTocLines(collected)
          inToc = false; tocLines = Vector.newBuilder[String]
          idx += 1; consumed = true
        case _ =>
      }

      if (!consumed) Markers.parseContentMarker(line) match {
        case Some(Markers.ContentStart) =>
          markerStack.push("content"); idx += 1; consumed = true
        case Some(Markers.ContentEnd) =>
          if (markerStack.nonEmpty && markerStack.top == "content") markerStack.pop()
          idx += 1; consumed = true
        case Some(Markers.SkipStart) =>
          markerStack.push("skip"); idx += 1; consumed = true
        case Some(Markers.SkipEnd) =>
          if (markerStack.nonEmpty && markerStack.top == "skip") markerStack.pop()
          idx += 1; consumed = true
        case _ =>
      }

      if (!consumed && inToc) {
        tocLines += line
        idx += 1
        consumed = true
      }

      if (!consumed) {
        val readAloud = Markers.readAloudFromStack(stackList)

        // heading
        val (headingOpt, warning) = Markers.parseHeadingWithWarning(line)
        warning.foreach(w => errors += ConvError("DEEP_HEADING", w, pageNumber, lineNum))
        headingOpt match {
          case Some(h) =>
            elements += Heading(h.level, h.text, readAloud)
            idx += 1
          case None =>
            // figure comment
            Markers.parseFigureComment(line) match {
              case Some(_) =>
                val figLines = collectFigureLines(lines, idx, cache)
                Markers.parseFigure(figLines).foreach(figures += _)
                idx += figLines.length
              case None =>
                // page metadata
                Markers.parsePageMetadata(cache.stripped(idx)) match {
                  case Some(meta) =>
                    metadata = Some(meta)
                    idx += 1
                  case None =>
                    val (isList, _, _) = cache.isList(idx)
                    var handled = false
                    if (isList) {
                      val (listLines, listIdx) = collectListLines(lines, idx, cache)
                      if (listLines.length >= 2) {
                        Markers.parseList(listLines).foreach { l =>
                          elements += ListEl(l.items, l.listType, readAloud)
                        }
                        idx = listIdx
                        handled = true
                      }
                      // single item: fall through to paragraph handling
                    }
                    if (!handled) {
                      if (cache.stripped(idx).nonEmpty) {
                        val (paraLines, paraIdx) = collectParagraphLines(lines, idx, cache)
                        Paragraphs.parseParagraph(paraLines).foreach { p =>
                          elements += Paragraph(p.text, readAloud)
                        }
                        idx = paraIdx
                      } else {
                        idx += 1
                      }
                    }
                }
            }
        }
      }
    }

    if (inToc) {
      val collected = tocLines.result()
      if (collected.nonEmpty) tocEntries ++= TocParse.parseTocLines(collected)
    }

    val page = ParsedPage(pageNumber, sourceFile, elements.result(), figures.result(), metadata)
    (page, errors.result(), tocEntries.result(), hadTocMarker)
  }

  /** Per-page memo for the two classification results the parse asks for
    * more than once per line (strip + list detection): each classifier is
    * pure, so caching is semantics-free — it only removes rework. */
  private final class LineCache(lines: IndexedSeq[String]) {
    private val strippedA = new Array[String](lines.length)
    private val isListA = new Array[(Boolean, String, String)](lines.length)
    def stripped(i: Int): String = {
      var v = strippedA(i)
      if (v == null) { v = Py.strip(lines(i)); strippedA(i) = v }
      v
    }
    def isList(i: Int): (Boolean, String, String) = {
      var v = isListA(i)
      if (v == null) { v = Markers.isListLine(lines(i)); isListA(i) = v }
      v
    }
  }

  /** _collect_figure_lines (page.py:404-423): from the comment line, up to
    * 10 lines, stop at blank. */
  private def collectFigureLines(lines: IndexedSeq[String], startIdx: Int,
      c: LineCache): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = startIdx
    var stop = false
    while (i < lines.length && i < startIdx + 10 && !stop) {
      if (c.stripped(i).isEmpty) stop = true
      else { out += lines(i); i += 1 }
    }
    out.result()
  }

  /** _collect_list_lines (page.py:426-448). */
  private def collectListLines(lines: IndexedSeq[String], startIdx: Int,
      c: LineCache): (Vector[String], Int) = {
    val out = Vector.newBuilder[String]
    out += lines(startIdx)
    var i = startIdx + 1
    var stop = false
    while (i < lines.length && !stop) {
      if (c.stripped(i).isEmpty) stop = true
      else {
        if (c.isList(i)._1) { out += lines(i); i += 1 } else stop = true
      }
    }
    (out.result(), i)
  }

  /** _should_stop_paragraph (page.py:451-492). */
  private def shouldStopParagraph(lines: IndexedSeq[String], idx: Int, c: LineCache): Boolean = {
    val line = lines(idx)
    if (c.stripped(idx).isEmpty) return true
    if (Markers.parseHeading(line).isDefined) return true
    if (c.isList(idx)._1) {
      val lookahead = idx + 1
      if (lookahead < lines.length) {
        if (c.isList(lookahead)._1) return true
      }
      // single list marker: treated as part of the paragraph
    }
    if (Markers.parseFigureComment(line).isDefined) return true
    if (Markers.parsePageMetadata(c.stripped(idx)).isDefined) return true
    if (Markers.parseTocMarker(line).isDefined) return true
    if (Markers.parseContentMarker(line).isDefined) return true
    false
  }

  /** _collect_paragraph_lines (page.py:495-513). */
  private def collectParagraphLines(lines: IndexedSeq[String], startIdx: Int,
      c: LineCache): (Vector[String], Int) = {
    val out = Vector.newBuilder[String]
    var i = startIdx
    var stop = false
    while (i < lines.length && !stop) {
      if (shouldStopParagraph(lines, i, c)) stop = true
      else { out += lines(i); i += 1 }
    }
    (out.result(), i)
  }
}
