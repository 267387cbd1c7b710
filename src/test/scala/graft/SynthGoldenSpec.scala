package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Extract

/** Randomized cross-validation: 12 books produced by the synthetic
  * generator were run through the REFERENCE implementation
  * (scripts/gen_golden.py); Extract must reproduce every span. This
  * covers surface forms the two hand fixtures don't reach (running-head
  * dash variants, TOC leaders, skip spans across pages, ordered lists,
  * deep headings, figure captions) across ~1,400 spans. */
class SynthGoldenSpec extends AnyFunSuite {

  (0 until 12).foreach { i =>
    test(s"synthetic doc_$i matches reference extraction") {
      val doc = Fixtures.mdToDoc(s"/fixtures/synth/doc_$i.md", s"doc_$i")
      val expected = Fixtures.goldenSpans(s"/fixtures/synth/doc_$i.golden.tsv", s"doc_$i")
      val got = Extract.extractDoc(doc).spans
      assert(got.length == expected.length,
        s"span count: got ${got.length} expected ${expected.length}\n" +
          got.zipAll(expected, null, null).filter { case (a, b) => a != b }
            .take(3).mkString("\n"))
      got.zip(expected).zipWithIndex.foreach { case ((g, e), idx) =>
        assert(g == e, s"doc_$i span $idx:\n  got      $g\n  expected $e")
      }
    }
  }
}
