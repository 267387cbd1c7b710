package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.layout.SplitSpread
import graft.layout.SplitSpread.{Box, TrimConfig}

/** Split-spread trim/crop geometry vs the REFERENCE: 400 seeded random
  * (dims, TrimConfig, overlap, mode) cases through the actual
  * split_spread.py (scripts/gen_split_spread.py — faked-PIL crop
  * algebra), pinning the global trim box and the final page boxes in
  * original image coordinates. */
class SplitSpreadSpec extends AnyFunSuite {

  private case class Case(w: Int, h: Int, cfg: TrimConfig, overlap: Int,
      mode: String, g: Box, pages: Vector[(String, Box, Int, Int)])

  private lazy val cases: Vector[Case] = {
    val lines = Fixtures.resourceLines("/fixtures/split_spread.golden.tsv")
    val byCase = lines.map(_.split("\t")).groupBy(_(1).toInt)
    byCase.toVector.sortBy(_._1).map { case (_, rows) =>
      val c = rows.find(_(0) == "C").get
      val g = rows.find(_(0) == "G").get
      val ps = rows.filter(_(0) == "P").map { p =>
        (p(2), Box(p(3).toInt, p(4).toInt, p(5).toInt, p(6).toInt),
          p(7).toInt, p(8).toInt)
      }
      Case(c(2).toInt, c(3).toInt,
        TrimConfig(c(4).toDouble, c(5).toDouble, c(6).toDouble, c(7).toDouble,
          c(8).toDouble, c(9).toDouble, c(10).toDouble, c(11).toDouble),
        c(12).toInt, c(13), Box(g(2).toInt, g(3).toInt, g(4).toInt, g(5).toInt), ps)
    }
  }

  test("400-case reference differential: global trim box") {
    assert(cases.size == 400)
    cases.foreach { c =>
      assert(SplitSpread.globalTrimBox(c.w, c.h, c.cfg) == c.g, s"case $c")
    }
  }

  test("400-case reference differential: page crop boxes + sizes + sides") {
    cases.foreach { c =>
      val got = SplitSpread.cropPage("page_0001.png", c.w, c.h, c.mode, c.cfg, c.overlap)
      val want = c.pages
      assert(got.length == want.length, s"case $c")
      got.zip(want).foreach { case (pc, (side, box, ow, oh)) =>
        assert(pc.side == side && pc.box == box, s"case $c got $pc want ($side,$box)")
        assert(pc.box.width == ow && pc.box.height == oh, s"case $c dims")
      }
    }
  }

  test("naming: spread splits stem_L/_R, single passes through (split_spread.py:300-310)") {
    val spread = SplitSpread.cropPage("page_0042.png", 100, 100, "spread", TrimConfig(), 0)
    assert(spread.map(_.outName) == Vector("page_0042_L.png", "page_0042_R.png"))
    val single = SplitSpread.cropPage("page_0042.png", 100, 100, "single", TrimConfig(), 0)
    assert(single.map(_.outName) == Vector("page_0042.png"))
  }

  test("TrimConfig validates [0.0, 0.5) like validate_trim_value") {
    intercept[IllegalArgumentException](TrimConfig(globalTop = 0.5))
    intercept[IllegalArgumentException](TrimConfig(rightPageInner = -0.01))
    TrimConfig(globalTop = 0.4999) // ok
  }

  test("crop composition invariant: composed box == two-stage crops") {
    // the distributed plan emits ONE original-coordinate box per page;
    // PIL's crop(a).crop(b) == crop(a-offset b) must hold for the split
    cases.filter(_.mode == "spread").take(50).foreach { c =>
      val g = SplitSpread.globalTrimBox(c.w, c.h, c.cfg)
      val (l, r) = SplitSpread.splitBoxes(g.width, g.height, c.overlap,
        c.cfg.leftPageOuter, c.cfg.rightPageOuter, c.cfg.leftPageInner, c.cfg.rightPageInner)
      val composed = SplitSpread.cropPage("p.png", c.w, c.h, "spread", c.cfg, c.overlap)
      assert(composed(0).box == Box(g.left + l.left, g.top, g.left + l.right, g.top + l.bottom))
      assert(composed(1).box == Box(g.left + r.left, g.top, g.left + r.right, g.top + r.bottom))
    }
  }
}
