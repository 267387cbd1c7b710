package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Extract

/** Span-sequence equality vs reference-generated goldens — the north
  * rule's per-row invariant (kind, text, media_ref, order), plus the
  * attribute columns. */
class ExtractGoldenSpec extends AnyFunSuite {

  private def check(base: String): Unit = {
    val doc = Fixtures.mdToDoc(s"/fixtures/$base.md", base)
    val expected = Fixtures.goldenSpans(s"/fixtures/$base.golden.tsv", base)
    val result = Extract.extractDoc(doc)
    val got = result.spans
    assert(got.length == expected.length,
      s"span count: got ${got.length}, expected ${expected.length}\n" +
        got.zipAll(expected, null, null).filter { case (a, b) => a != b }.take(5).mkString("\n"))
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"span $i differs:\n  got      $g\n  expected $e")
    }
    assert(result.span_count == expected.length)
  }

  test("sample_book golden span sequence (reference e2e fixture)") {
    check("sample_book")
  }

  test("toc_book golden span sequence (running head, markers, toc, exclusions)") {
    check("toc_book")
  }

  test("toc_book errors (deep heading + missing page number)") {
    val doc = Fixtures.mdToDoc("/fixtures/toc_book.md", "toc_book")
    val errs = Extract.extractDoc(doc).errors
    assert(errs.map(e => (e.error_type, e.page_number, e.line_number)) ==
      Vector(("DEEP_HEADING", "7", 83), ("PAGE_NUMBER_NOT_FOUND", "", 106)))
  }

  test("sample_book deep-heading error") {
    val doc = Fixtures.mdToDoc("/fixtures/sample_book.md", "sample_book")
    val errs = Extract.extractDoc(doc).errors
    assert(errs.map(e => (e.error_type, e.page_number, e.line_number)) ==
      Vector(("DEEP_HEADING", "5", 54)))
  }

  test("full-width digits: python \\d / int() semantics (raw pattern-1, interned page_NNNN)") {
    check("fullwidth_book")
  }

  test("offsets are dense 0..n-1") {
    val doc = Fixtures.mdToDoc("/fixtures/toc_book.md", "toc_book")
    val spans = Extract.extractDoc(doc).spans
    assert(spans.map(_.offset) == spans.indices.toVector)
  }

  test("media refs preserved in page order") {
    val doc = Fixtures.mdToDoc("/fixtures/toc_book.md", "toc_book")
    val figs = Extract.extractDoc(doc).spans.filter(_.kind == "figure").map(_.media_ref)
    assert(figs == Vector("figures/cover.png", "figures/page_0007_arch.png"))
  }
}
