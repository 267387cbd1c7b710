package graft.matching

import java.util.regex.Pattern
import scala.collection.mutable
import graft.model.TocEntry
import graft.text.{Normalize, Py, SeqRatio}

/** TOC entry <-> body heading matching engine.
  * Faithful port of src/book_converter/heading_matcher.py:55-287.
  *
  * Ordered 1:1 assignment with a monotone line cursor (sequential
  * constraint), two passes (exact, then fuzzy bounded between the
  * neighbouring matched lines) — NOT a relational join; runs in-row per
  * document (SURVEY §2.4).
  */
object TocMatcher {

  /** Body heading with position (reference Heading.line_number). */
  final case class BodyHeading(text: String, level: Int, lineNumber: Int)

  sealed trait MatchType
  case object Exact extends MatchType
  case object Fuzzy extends MatchType
  case object Missing extends MatchType

  final case class MatchResult(
      tocEntry: TocEntry,
      bodyHeading: Option[BodyHeading],
      matchType: MatchType,
      similarity: Double,
      lineNumber: Int
  )

  private val U = Pattern.UNICODE_CHARACTER_CLASS
  private val headingNumberP = Pattern.compile("^(\\d+(?:\\.\\d+)*)\\s+", U)

  /** _extract_heading_number (heading_matcher.py:18-34). */
  def extractHeadingNumber(text: String): Option[String] = {
    val m = headingNumberP.matcher(text)
    if (m.lookingAt()) Some(m.group(1)) else None
  }

  /** _numbers_compatible (heading_matcher.py:37-53). */
  def numbersCompatible(tocNumber: String, headingNumber: Option[String]): Boolean =
    headingNumber.forall(_ == tocNumber)

  private def norm(s: String): String = Normalize.spaces(Normalize.numberFormat(s))

  private def stripNumber(s: String): String =
    headingNumberP.matcher(s).replaceFirst("")

  /** match_toc_to_body (heading_matcher.py:55-233). */
  def matchTocToBody(
      tocEntries: Seq[TocEntry],
      bodyHeadings: Seq[BodyHeading],
      similarityThreshold: Double = 0.8
  ): Vector[MatchResult] = {
    if (tocEntries.isEmpty) return Vector.empty
    val usedHeadings = mutable.HashSet.empty[Int]
    var lastMatchedLine = 0

    // pre-process headings
    val headingInfo = bodyHeadings.map { h =>
      val normalized = norm(h.text)
      (normalized, stripNumber(normalized), extractHeadingNumber(normalized))
    }.toIndexedSeq
    def hLine(idx: Int): Int = {
      val h = bodyHeadings(idx)
      if (h.lineNumber > 0) h.lineNumber else idx + 1
    }

    val results = mutable.ArrayBuffer.fill[Option[MatchResult]](tocEntries.size)(None)

    // === Pass 1: exact, sequential ===
    tocEntries.zipWithIndex.foreach { case (toc, tocIdx) =>
      val tocFull = if (toc.number.nonEmpty) Py.strip(s"${toc.number} ${toc.text}") else toc.text
      val tocFullN = norm(tocFull)
      val tocTitleN = norm(toc.text)
      var matched = false
      var hIdx = 0
      while (hIdx < bodyHeadings.size && !matched) {
        if (!usedHeadings.contains(hIdx) && !Normalize.isSpecialMarker(bodyHeadings(hIdx).text)) {
          val line = hLine(hIdx)
          if (line > lastMatchedLine) {
            val (hN, hNoNum, hNum) = headingInfo(hIdx)
            if (numbersCompatible(toc.number, hNum)) {
              val isExact = hN == tocFullN || hN == tocTitleN || hNoNum == tocTitleN
              if (isExact) {
                results(tocIdx) = Some(
                  MatchResult(toc, Some(bodyHeadings(hIdx)), Exact, 1.0, line))
                usedHeadings += hIdx
                lastMatchedLine = line
                matched = true
              }
            }
          }
        }
        hIdx += 1
      }
    }

    // === Pass 2: fuzzy for remaining, bounded between neighbours ===
    tocEntries.zipWithIndex.foreach { case (toc, tocIdx) =>
      if (results(tocIdx).isEmpty) {
        val prevMatchedLine = (tocIdx - 1 to 0 by -1).iterator
          .flatMap(i => results(i).filter(_.lineNumber > 0).map(_.lineNumber))
          .nextOption().getOrElse(0)
        val nextMatchedLine = (tocIdx + 1 until tocEntries.size).iterator
          .flatMap(i => results(i).filter(_.lineNumber > 0).map(_.lineNumber))
          .nextOption().getOrElse(Int.MaxValue)
        val tocTitleN = norm(toc.text)

        var best: Option[MatchResult] = None
        var bestSimilarity = 0.0
        var bestHIdx = -1
        var bestHLine = 0
        bodyHeadings.indices.foreach { hIdx =>
          if (!usedHeadings.contains(hIdx) && !Normalize.isSpecialMarker(bodyHeadings(hIdx).text)) {
            val line = hLine(hIdx)
            if (line > prevMatchedLine && line < nextMatchedLine) {
              val (_, hNoNum, hNum) = headingInfo(hIdx)
              if (numbersCompatible(toc.number, hNum)) {
                val similarity = SeqRatio.ratio(tocTitleN, hNoNum)
                if (similarity >= similarityThreshold && similarity > bestSimilarity) {
                  bestSimilarity = similarity
                  best = Some(MatchResult(toc, Some(bodyHeadings(hIdx)), Fuzzy, similarity, line))
                  bestHIdx = hIdx
                  bestHLine = line
                }
              }
            }
          }
        }
        best.foreach { b =>
          results(tocIdx) = Some(b)
          usedHeadings += bestHIdx
          lastMatchedLine = bestHLine
        }
      }
    }

    // === MISSING fill ===
    tocEntries.zipWithIndex.map { case (toc, i) =>
      results(i).getOrElse(MatchResult(toc, None, Missing, 0.0, 0))
    }.toVector
  }

  /** find_similar_candidate (heading_matcher.py:236-287). */
  def findSimilarCandidate(
      toc: TocEntry,
      headings: Seq[BodyHeading],
      threshold: Double = 0.8
  ): Option[(BodyHeading, Double)] = {
    if (headings.isEmpty) return None
    val tocText = norm(toc.text)
    var best: Option[(BodyHeading, Double)] = None
    headings.foreach { h =>
      val title = stripNumber(norm(h.text))
      val sim = SeqRatio.ratio(tocText, title)
      if (sim >= threshold && best.forall(_._2 < sim)) best = Some((h, sim))
    }
    best
  }
}
