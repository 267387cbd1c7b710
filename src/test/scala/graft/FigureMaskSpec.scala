package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.layout.FigureMask
import graft.model.Region

/** Figure-mask geometry vs the REFERENCE: 300 seeded random (page,
  * regions) cases through the actual mask_figures / mask_figure_regions /
  * create_text_mask (scripts/gen_figure_mask.py — faked PIL tracking
  * real pixel sets), pinning masked/visible pixel counts; plus a
  * brute-force pixel-grid differential for the sweep union. */
class FigureMaskSpec extends AnyFunSuite {

  private case class Case(w: Int, h: Int, regions: Vector[Region],
      nFig: Int, figPx: Long, nDrawn: Int, clampPx: Long, visPx: Long)

  private lazy val cases: Vector[Case] = {
    val lines = Fixtures.resourceLines("/fixtures/figure_mask.golden.tsv")
    val byCase = lines.map(_.split("\t")).groupBy(_(1).toInt)
    byCase.toVector.sortBy(_._1).map { case (_, rows) =>
      val c = rows.find(_(0) == "C").get
      val f = rows.find(_(0) == "F").get
      val m = rows.find(_(0) == "M").get
      val t = rows.find(_(0) == "T").get
      val regions = rows.filter(_(0) == "I").map { r =>
        Region(r(2), r(3).toInt, r(4).toInt, r(5).toInt, r(6).toInt, 1.0)
      }
      Case(c(2).toInt, c(3).toInt, regions, f(2).toInt, f(3).toLong,
        m(2).toInt, m(3).toLong, t(2).toLong)
    }
  }

  test("300-case reference differential: mask_figures pixel union") {
    assert(cases.size == 300)
    cases.foreach { c =>
      val s = FigureMask.maskStats(c.w, c.h, c.regions)
      assert(s.nFigures == c.nFig, s"nFigures $c")
      assert(s.maskedPx == c.figPx, s"maskedPx $c")
    }
  }

  test("300-case reference differential: mask_figure_regions clamp + pixels") {
    cases.foreach { c =>
      val clamped = FigureMask.clampFigureRects(c.w, c.h,
        FigureMask.figureRegions(c.regions))
      assert(clamped.length == c.nDrawn, s"nDrawn $c")
      val px = FigureMask.unionArea(clamped.map(r =>
        FigureMask.drawnPxRect(c.w, c.h, r.x1, r.y1, r.x2, r.y2)))
      assert(px == c.clampPx, s"clampPx $c")
    }
  }

  test("300-case reference differential: create_text_mask visible pixels") {
    cases.foreach { c =>
      val s = FigureMask.maskStats(c.w, c.h, c.regions)
      assert(s.visiblePx == c.visPx, s"visiblePx $c")
    }
  }

  test("sweep union == brute-force pixel grid (500 random rect sets)") {
    val rng = new scala.util.Random(20260817)
    (0 until 500).foreach { i =>
      val w = 1 + rng.nextInt(60); val h = 1 + rng.nextInt(60)
      val rects = Vector.fill(rng.nextInt(8)) {
        val x1 = rng.nextInt(w + 20) - 10; val y1 = rng.nextInt(h + 20) - 10
        FigureMask.PxRect(x1, y1, x1 + rng.nextInt(w + 5), y1 + rng.nextInt(h + 5))
      }.map(r => FigureMask.PxRect(math.max(0, r.x1), math.max(0, r.y1),
        math.min(w, r.x2), math.min(h, r.y2)))
      val grid = Array.fill(w * h)(false)
      rects.foreach { r =>
        var x = math.max(0, r.x1)
        while (x < r.x2) {
          var y = math.max(0, r.y1)
          while (y < r.y2) { grid(x * h + y) = true; y += 1 }
          x += 1
        }
      }
      assert(FigureMask.unionArea(rects) == grid.count(identity).toLong, s"set $i")
    }
  }

  test("edge conventions: drawn is corner-inclusive, pasted is half-open") {
    // a 1x1 'rectangle' draw covers one pixel; the same box pasted covers none
    assert(FigureMask.drawnPxRect(10, 10, 3, 3, 3, 3).area == 1L)
    assert(FigureMask.pastedPxRect(10, 10, 3, 3, 3, 3).area == 0L)
    // x2 == 0 rect still draws pixel column 0 but fails the clamp check
    assert(FigureMask.drawnPxRect(10, 10, -5, 0, 0, 9).area == 10L)
    assert(FigureMask.clampFigureRects(10, 10,
      Seq(Region("FIGURE", -5, 0, 0, 9, 1.0))).isEmpty)
  }
}
