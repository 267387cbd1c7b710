package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.matching.{NormalizationRules, TocMatcher}
import graft.matching.TocMatcher.BodyHeading
import graft.model.TocEntry
import graft.parse.{Markers, TocParse}

/** Normalization-rule generation + TOC split, verified against
  * reference-generated goldens. */
class NormRulesSpec extends AnyFunSuite {

  test("generate_rules matches reference goldens (15 books)") {
    val cases = scala.collection.mutable.Map.empty[Int, (Vector[TocEntry], Vector[BodyHeading])]
    Fixtures.resourceLines("/fixtures/normrules.cases.tsv").foreach { line =>
      val f = line.split("\t", -1)
      val id = f(0).toInt
      val (toc, hs) = cases.getOrElse(id, (Vector.empty, Vector.empty))
      if (f(1) == "T") cases(id) = (toc :+ TocEntry(Fixtures.unesc(f(2)), f(3).toInt, f(4), f(5)), hs)
      else cases(id) = (toc, hs :+ BodyHeading(Fixtures.unesc(f(2)), f(3).toInt, f(6).toInt))
    }
    val expected = Fixtures.resourceLines("/fixtures/normrules.expected.tsv")
      .map(_.split("\t", -1)).groupBy(_(0).toInt)
    cases.toSeq.sortBy(_._1).foreach { case (caseId, (toc, headings)) =>
      val matches = TocMatcher.matchTocToBody(toc, headings)
      val rules = NormalizationRules.generateRules(matches)
      val exp = expected.getOrElse(caseId, Vector.empty).sortBy(_(1).toInt)
      assert(rules.size == exp.size, s"case $caseId rule count: got ${rules.size}")
      rules.zip(exp).foreach { case (r, e) =>
        assert(r.original == Fixtures.unesc(e(2)), s"case $caseId original")
        assert(r.normalized == Fixtures.unesc(e(3)), s"case $caseId normalized")
        assert(r.lineNumber == e(4).toInt, s"case $caseId line")
        val action = r.action match {
          case NormalizationRules.AddNumber => "add_number"
          case NormalizationRules.AddMarker => "add_marker"
          case NormalizationRules.FormatOnly => "format_only"
          case NormalizationRules.NoneAction => "none"
        }
        assert(action == e(5), s"case $caseId action")
      }
    }
  }

  test("toc text normalize + entry split match reference goldens") {
    Fixtures.resourceLines("/fixtures/tocsplit.golden.tsv").foreach { line =>
      val f = line.split("\t", -1)
      val lines = Fixtures.unesc(f(0)).split("", -1).toVector
      assert(TocParse.normalizeTocText(lines) == Fixtures.unesc(f(1)), s"normalize $lines")
      val expEntries =
        if (f(2).isEmpty) Vector.empty else Fixtures.unesc(f(2)).split("", -1).toVector
      assert(TocParse.splitTocEntries(Fixtures.unesc(f(1))) == expEntries, s"split $lines")
    }
  }

  test("figure placeholder (figure.py:75-103)") {
    assert(Markers.parseFigurePlaceholder("[図1]").contains("図1"))
    assert(Markers.parseFigurePlaceholder("テキスト [写真3] テキスト").contains("写真3"))
    assert(Markers.parseFigurePlaceholder("[チャート 2a]").contains("チャート 2a"))
    assert(Markers.parseFigurePlaceholder("通常のテキスト").isEmpty)
  }
}
