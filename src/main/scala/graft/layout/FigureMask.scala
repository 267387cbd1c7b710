package graft.layout

import graft.model.Region

/** Figure-region mask geometry — the SURVEY §2.2 "figure-region mask"
  * operator re-expressed for Spark.
  *
  * The reference white-fills FIGURE bboxes before OCR (`mask_figures`
  * src/utils.py:71-92), whites out clamped figure regions per page
  * (`mask_figure_regions` src/utils.py:95-129) and builds a text-only
  * mask by pasting TEXT-like regions onto a white canvas
  * (`create_text_mask` src/ocr_ensemble/voting.py:103-140). The pixel
  * fill is the stubbed codec boundary (same contract as
  * [[graft.multimodal.Media.decodeStub]]); the GEOMETRY — which rects
  * are selected, how they clamp, and how many page pixels end up
  * masked/visible — is exact and reference-differential-tested
  * (scripts/gen_figure_mask.py runs the real utils.py/voting.py against
  * a faked PIL that tracks actual pixel sets).
  *
  * Two deliberately different edge conventions, both PIL's:
  *  - `ImageDraw.rectangle([x1,y1,x2,y2])` fills INCLUSIVE of the far
  *    corner → a drawn rect covers [x1, x2+1) x [y1, y2+1) before canvas
  *    clipping (mask_figures / mask_figure_regions).
  *  - `crop((x1,y1,x2,y2))` + `paste(_, (x1,y1))` is half-open → a
  *    pasted text region covers [x1, x2) x [y1, y2) clipped to the
  *    canvas (create_text_mask).
  *
  * Regions per page are tiny (~10s) so everything here is in-row — never
  * a join or shuffle at any corpus scale (same argument as
  * [[ReadingOrder]]).
  */
object FigureMask {

  /** create_text_mask's default visible types (voting.py:124-125). */
  val DefaultTextTypes: Set[String] = Set("TEXT", "TITLE", "CAPTION", "FOOTNOTE")

  /** Half-open pixel rect [x1, x2) x [y1, y2). */
  final case class PxRect(x1: Int, y1: Int, x2: Int, y2: Int) {
    def nonEmpty: Boolean = x1 < x2 && y1 < y2
    def area: Long = if (nonEmpty) (x2 - x1).toLong * (y2 - y1) else 0L
  }

  /** mask_figures (utils.py:71-92): the FIGURE-typed regions, unclamped
    * (ImageDraw clips at raster time, not selection time). */
  def figureRegions(regions: Seq[Region]): Vector[Region] =
    regions.filter(_.kind == "FIGURE").toVector

  /** mask_figure_regions (utils.py:95-129): clamp each figure bbox to
    * the page, keep only non-empty (x1 < x2 && y1 < y2 AFTER clamping).
    * Returned rects are still PIL-draw INCLUSIVE corners, like the
    * reference's draw.rectangle call. */
  def clampFigureRects(w: Int, h: Int, figures: Seq[Region]): Vector[Region] =
    figures.flatMap { r =>
      val x1 = math.max(0, r.x1); val y1 = math.max(0, r.y1)
      val x2 = math.min(w, r.x2); val y2 = math.min(h, r.y2)
      if (x1 < x2 && y1 < y2) Some(r.copy(x1 = x1, y1 = y1, x2 = x2, y2 = y2))
      else None
    }.toVector

  /** Pixels covered by DRAWING rect (x1,y1,x2,y2) on a w x h canvas:
    * inclusive far corner, clipped to the canvas. Empty for inverted
    * corners (the reference never draws those — Pillow raises). */
  def drawnPxRect(w: Int, h: Int, x1: Int, y1: Int, x2: Int, y2: Int): PxRect =
    PxRect(math.max(0, x1), math.max(0, y1),
      math.min(w, x2 + 1), math.min(h, y2 + 1))

  /** Pixels covered by crop+paste of box (x1,y1,x2,y2): half-open,
    * clipped to the canvas (paste clips, crop pads). */
  def pastedPxRect(w: Int, h: Int, x1: Int, y1: Int, x2: Int, y2: Int): PxRect =
    PxRect(math.max(0, x1), math.max(0, y1), math.min(w, x2), math.min(h, y2))

  /** Exact union area of half-open pixel rects via coordinate-compressed
    * x-slab sweep: O(n^2) in the handful of regions per page, allocation
    * bounded by region count — in-row safe. (Sum-of-areas over-counts
    * overlaps; the union is what the reference's canvas actually
    * measures.) */
  def unionArea(rects: Seq[PxRect]): Long = {
    val rs = rects.filter(_.nonEmpty)
    if (rs.isEmpty) return 0L
    val xs = rs.flatMap(r => Seq(r.x1, r.x2)).distinct.sorted
    var total = 0L
    var i = 0
    while (i < xs.length - 1) {
      val xa = xs(i); val xb = xs(i + 1)
      val ys = rs.filter(r => r.x1 <= xa && r.x2 >= xb)
        .map(r => (r.y1, r.y2)).sortBy(_._1)
      var covered = 0L
      var curLo = Int.MinValue; var curHi = Int.MinValue
      for ((lo, hi) <- ys) {
        if (lo > curHi) {
          if (curHi > curLo) covered += (curHi - curLo).toLong
          curLo = lo; curHi = hi
        } else if (hi > curHi) curHi = hi
      }
      if (curHi > curLo) covered += (curHi - curLo).toLong
      total += covered * (xb - xa)
      i += 1
    }
    total
  }

  /** Per-page mask summary — the analytics a production pipeline keeps
    * about the (stubbed) raster step. */
  final case class MaskStats(
      nFigures: Int,       // FIGURE regions selected (mask_figures)
      nMasked: Int,        // surviving mask_figure_regions' clamp
      maskedPx: Long,      // union of drawn figure rects (inclusive corners)
      visiblePx: Long,     // union of pasted text rects (create_text_mask)
      maskRatio: Double)   // maskedPx / page px

  /** Full geometric replay of mask_figures + mask_figure_regions +
    * create_text_mask on one page's regions. */
  def maskStats(w: Int, h: Int, regions: Seq[Region],
      textTypes: Set[String] = DefaultTextTypes): MaskStats = {
    val figs = figureRegions(regions)
    val clamped = clampFigureRects(w, h, figs)
    val maskedPx = unionArea(figs.map(r => drawnPxRect(w, h, r.x1, r.y1, r.x2, r.y2)))
    val visiblePx = unionArea(regions.filter(r => textTypes.contains(r.kind))
      .map(r => pastedPxRect(w, h, r.x1, r.y1, r.x2, r.y2)))
    val pagePx = w.toLong * h
    MaskStats(figs.length, clamped.length, maskedPx, visiblePx,
      if (pagePx > 0) maskedPx.toDouble / pagePx else 0.0)
  }
}
