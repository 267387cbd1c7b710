package graft.matching

import java.util.regex.Pattern
import graft.matching.TocMatcher.{MatchResult, Missing}
import graft.text.Normalize

/** Normalization-rule generation from match results.
  * Faithful port of src/book_converter/normalization_rules.py:16-139
  * (generate_rules + _heading_level_from_number); the sed-script emitter
  * is a formatting sink and intentionally out of scope.
  */
object NormalizationRules {

  sealed trait Action
  case object AddNumber extends Action
  case object AddMarker extends Action
  case object FormatOnly extends Action
  case object NoneAction extends Action

  final case class Rule(original: String, normalized: String, lineNumber: Int, action: Action)

  private val U = Pattern.UNICODE_CHARACTER_CLASS
  private val numberLeadP = Pattern.compile("^\\d+(?:\\.\\d+)*\\s+", U)
  private val numberLeadAnySepP = Pattern.compile("^\\d+(?:[.\\-・]\\d+)*\\s+", U)

  /** _heading_level_from_number. */
  def headingLevelFromNumber(number: String): Int =
    graft.group.Sections.headingLevelFromNumber(number)

  /** generate_rules (normalization_rules.py:31-139). */
  def generateRules(matches: Seq[MatchResult]): Vector[Rule] = {
    val rules = Vector.newBuilder[Rule]
    matches.foreach { m =>
      if (m.matchType != Missing && m.bodyHeading.isDefined) {
        val body = m.bodyHeading.get
        val bodyText = body.text
        val bodyLevel = body.level
        val tocNumber = m.tocEntry.number
        val tocTitle = m.tocEntry.text
        val bodyNormalized = Normalize.spaces(Normalize.numberFormat(bodyText))
        val hasNumber = numberLeadP.matcher(bodyNormalized).lookingAt()
        val expectedText = if (tocNumber.nonEmpty) s"$tocNumber $tocTitle" else tocTitle
        val expectedLevel = headingLevelFromNumber(tocNumber)
        val expectedFull = s"${"#" * expectedLevel} $expectedText"

        var action: Option[Action] = None
        var normalizedText = ""
        if (bodyLevel == 0) {
          normalizedText = expectedFull
          action = Some(AddMarker)
        } else if (!hasNumber && tocNumber.nonEmpty) {
          normalizedText = expectedFull
          action = Some(AddNumber)
        } else {
          val currentFull = s"${"#" * bodyLevel} $bodyText"
          if (currentFull != expectedFull) {
            normalizedText = expectedFull
            val bodyNoNumber = numberLeadAnySepP.matcher(bodyNormalized).replaceFirst("")
            action = Some(if (bodyNoNumber == tocTitle && hasNumber) FormatOnly else NoneAction)
          }
        }
        action.foreach { a =>
          val original =
            if (bodyLevel > 0) {
              if (bodyText.startsWith("#")) bodyText else s"${"#" * bodyLevel} $bodyText"
            } else bodyText
          rules += Rule(original, normalizedText, m.lineNumber, a)
        }
      }
    }
    rules.result()
  }
}
