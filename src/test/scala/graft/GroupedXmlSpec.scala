package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.GroupedXml

/** group_pages_by_toc parity: byte-equality against XML produced by
  * RUNNING the reference's convert_book(group_pages=True) on the same
  * fixture books, including its failure modes (int("") on empty page
  * numbers; PageValidationError when grouping drops >50% of pages). An
  * offline 200-book sweep additionally matches outcome (bytes or raise
  * kind) per book. */
class GroupedXmlSpec extends AnyFunSuite {

  private def check(md: String, ref: String, id: String): Unit = {
    val doc = Fixtures.mdToDoc(md, id)
    val got = GroupedXml.buildGroupedXml(doc)
    val expected = Fixtures.resourceLines(ref).mkString("\n")
    if (got != expected) {
      val i = got.zip(expected).indexWhere { case (a, b) => a != b }
      val at = if (i < 0) math.min(got.length, expected.length) else i
      fail(s"first diff at char $at:\n  got      …${got.slice(at - 40, at + 60)}…\n" +
        s"  expected …${expected.slice(at - 40, at + 60)}…")
    }
  }

  test("sample_book grouped (no TOC -> all pages in front-matter, flattened)")(
    check("/fixtures/sample_book.md", "/fixtures/sample_book.grouped.xml", "sample_book"))

  test("emphasis_book grouped byte-equal")(
    check("/fixtures/emphasis_book.md", "/fixtures/emphasis_book.grouped.xml", "emphasis_book"))

  Seq(0, 2, 3, 5).foreach { i =>
    test(s"synth doc_$i grouped byte-equal (TOC hierarchy, front-matter, dup removal)")(
      check(s"/fixtures/synth/doc_$i.md", s"/fixtures/synth/doc_$i.grouped.xml", s"doc_$i"))
  }

  test("toc_book grouped raises like the reference (int('') on empty page number)") {
    val doc = Fixtures.mdToDoc("/fixtures/toc_book.md", "toc_book")
    intercept[NumberFormatException](GroupedXml.buildGroupedXml(doc))
  }

  Seq(1, 4).foreach { i =>
    test(s"synth doc_$i grouped raises PageValidation like the reference (>50% loss)") {
      val doc = Fixtures.mdToDoc(s"/fixtures/synth/doc_$i.md", s"doc_$i")
      intercept[GroupedXml.PageValidationException](GroupedXml.buildGroupedXml(doc))
    }
  }

  test("header-level keyword config changes assignment exactly like the reference") {
    // Episode 01/02 headings vs bare-number TOC entries: only the config
    // path (keyword match + lstrip('0')) can resolve "Episode 02" -> "2";
    // the fallback extracts "02", which misses the TOC — both goldens
    // produced by RUNNING convert_book with/without HeaderLevelConfig.
    val doc = Fixtures.mdToDoc("/fixtures/episode_book.md", "episode_book")
    val cfg = Some(graft.group.Sections.HeaderLevelConfig(level1 = Vector("episode")))
    val withCfg = GroupedXml.buildGroupedXml(doc, config = cfg)
    val noCfg = GroupedXml.buildGroupedXml(doc)
    assert(withCfg == Fixtures.resourceLines("/fixtures/episode_book.cfg.grouped.xml").mkString("\n"))
    assert(noCfg == Fixtures.resourceLines("/fixtures/episode_book.nocfg.grouped.xml").mkString("\n"))
    assert(withCfg != noCfg) // the config observably moves page 5 to chapter 2
  }

  test("第N章 mid-text does NOT mark a chapter-title page (anchored like re.search('^...'))") {
    // reference golden has NO type attribute: the heading "復習:第1章より"
    // contains 第1章 but not at position 0
    check("/fixtures/midchapter_book.md", "/fixtures/midchapter_book.grouped.xml",
      "midchapter_book")
    val xml = GroupedXml.buildGroupedXml(Fixtures.mdToDoc("/fixtures/midchapter_book.md", "m"))
    assert(!xml.contains("chapter-title"))
  }

  test("grouped output never contains page elements; page comments preserved") {
    val doc = Fixtures.mdToDoc("/fixtures/synth/doc_0.md", "doc_0")
    val xml = GroupedXml.buildGroupedXml(doc)
    assert(!xml.contains("<page "))
    assert(xml.contains("<!-- page "))
    assert(xml.contains("<chapter ") || xml.contains("<front-matter>"))
  }
}
