package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.group.Grouping
import graft.model._

/** Page grouping parity vs reference `_assign_pages_to_sections_new`
  * goldens (15 random books), plus hierarchy/validation units. */
class GroupingSpec extends AnyFunSuite {

  test("page->section assignment matches reference goldens") {
    final case class Case(keys: Set[String], pages: Vector[ParsedPage])
    val cases = scala.collection.mutable.Map.empty[Int, Case]
    Fixtures.resourceLines("/fixtures/grouping.cases.tsv").foreach { line =>
      val f = line.split("\t", -1)
      val id = f(0).toInt
      val c = cases.getOrElse(id, Case(Set.empty, Vector.empty))
      f(1) match {
        case "K" => cases(id) = c.copy(keys = c.keys + f(2))
        case "H" => cases(id) = c.copy(pages = c.pages :+
          ParsedPage("", "", Vector(Heading(2, Fixtures.unesc(f(2)))), Vector.empty, None))
        case "P" => cases(id) = c.copy(pages = c.pages :+
          ParsedPage("", "", Vector(Paragraph(Fixtures.unesc(f(2)))), Vector.empty, None))
      }
    }
    val expected = Fixtures.resourceLines("/fixtures/grouping.expected.tsv")
      .map(_.split("\t", -1)).groupBy(_(0).toInt)
    cases.toSeq.sortBy(_._1).foreach { case (caseId, c) =>
      val assigned = Grouping.assignPages(c.pages, c.keys)
      val exp = expected(caseId).sortBy(_(1).toInt).map(f => if (f(2).isEmpty) None else Some(f(2)))
      assert(assigned == exp.toVector, s"case $caseId")
    }
  }

  test("level inference from trailing-zero numbers (page_grouper/toc.py:13-28)") {
    assert(Grouping.inferLevelFromNumber("1.0.0").contains(1))
    assert(Grouping.inferLevelFromNumber("1.1.0").contains(2))
    assert(Grouping.inferLevelFromNumber("1.1.1").contains(3))
    assert(Grouping.inferLevelFromNumber("1.2.3.4").contains(3)) // capped
    assert(Grouping.inferLevelFromNumber("x").isEmpty)
  }

  test("duplicate-heading removal inside containers") {
    val elems = Vector(
      Heading(1, "Chapter 1 はじめに"),
      Paragraph("本文。"),
      Heading(2, "別の見出し"))
    val cleaned = Grouping.removeDuplicateHeadings(elems, Some("1"), "はじめに")
    assert(cleaned.collect { case h: Heading => h.text } == Vector("別の見出し"))
  }

  test("page count validation >= 50% (page_grouper/toc.py:77-100)") {
    assert(Grouping.validatePageCount(10, 6).isRight)
    assert(Grouping.validatePageCount(10, 5).isLeft)
    assert(Grouping.validatePageCount(0, 0).isRight)
  }
}
