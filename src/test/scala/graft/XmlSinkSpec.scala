package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.XmlBuilder

/** book.xml formatter parity: byte-equality against XML produced by
  * RUNNING the reference's convert_book (build_xml_with_errors live path)
  * on the same fixture books — covers pageAnnouncement, content wrapper,
  * emphasis segmentation (**bold** -> <em> with tails), legacy figure
  * attrs, pageMetadata, TOC begin/end, error comments, and ElementTree
  * serialization quirks (short empty elements, escaping). */
class XmlSinkSpec extends AnyFunSuite {

  private def refXml(name: String): String =
    Fixtures.resourceLines(name).mkString("\n")

  private def check(md: String, ref: String, id: String): Unit = {
    val doc = Fixtures.mdToDoc(md, id)
    val got = XmlBuilder.buildXmlWithErrors(doc)
    val expected = refXml(ref)
    if (got != expected) {
      val i = got.zip(expected).indexWhere { case (a, b) => a != b }
      val at = if (i < 0) math.min(got.length, expected.length) else i
      fail(s"first diff at char $at:\n  got      …${got.slice(at - 40, at + 60)}…\n" +
        s"  expected …${expected.slice(at - 40, at + 60)}…")
    }
  }

  test("sample_book.xml byte-equal to reference")(
    check("/fixtures/sample_book.md", "/fixtures/sample_book.ref.xml", "sample_book"))

  test("toc_book.xml byte-equal to reference (toc begin/end, errors)")(
    check("/fixtures/toc_book.md", "/fixtures/toc_book.ref.xml", "toc_book"))

  test("emphasis_book.xml byte-equal (bold in paragraph/heading/list/meta)")(
    check("/fixtures/emphasis_book.md", "/fixtures/emphasis_book.ref.xml", "emphasis_book"))

  (0 until 3).foreach { i =>
    test(s"synth doc_$i book.xml byte-equal to reference")(
      check(s"/fixtures/synth/doc_$i.md", s"/fixtures/synth/doc_$i.ref.xml", s"doc_$i"))
  }

  test("emSplit replicates python re.split with a capturing group") {
    assert(XmlBuilder.emSplit("a**b**c") == Vector("a", "b", "c"))
    assert(XmlBuilder.emSplit("**b**") == Vector("", "b", ""))
    assert(XmlBuilder.emSplit("x") == Vector("x"))
    assert(XmlBuilder.emSplit("a**b**c**d**e") == Vector("a", "b", "c", "d", "e"))
    assert(XmlBuilder.emSplit("open**不完全") == Vector("open**不完全"))
    // non-greedy across adjacent markers: **a****b** -> a, **, b? python:
    // re.split(r"\*\*(.+?)\*\*", "**a****b**") == ['', 'a', '', 'b', '']
    assert(XmlBuilder.emSplit("**a****b**") == Vector("", "a", "", "b", ""))
  }
}
