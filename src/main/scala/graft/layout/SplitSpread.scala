package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spread-image trim/crop geometry — the SURVEY §2.2 "trim/crop
  * (split-spread)" operator re-expressed for Spark.
  *
  * The reference (src/preprocessing/split_spread.py) is an image-side
  * step: PIL crops driven by pure integer arithmetic. The PIXELS are the
  * stubbed codec boundary here (same contract as
  * [[graft.multimodal.Media.decodeStub]] — this sandbox has no image
  * libs); everything the reference COMPUTES about the crop is exact and
  * reference-differential-tested (scripts/gen_split_spread.py runs the
  * real split_spread.py with a faked PIL whose crop-box algebra is
  * PIL's):
  *
  *  - two-stage trim: global 4-edge percentage trim applied BEFORE the
  *    split (`apply_global_trim`, split_spread.py:79-109), then per-page
  *    outer/inner edge trims AFTER the split (`split_spread`, :174-216);
  *    trim px = `int(dim * pct)` (truncation; pct validated in
  *    [0.0, 0.5), :64-76)
  *  - center split at `mid_x = trimmed_width // 2` with optional gutter
  *    `overlap_px`, L page = [left_outer, mid_x + overlap − left_inner),
  *    R page = [mid_x − overlap + right_inner, width − right_outer)
  *  - naming: `page_0001.png` → `page_0001_L.png` + `page_0001_R.png`
  *    in SPREAD mode, unchanged in SINGLE mode (:219-355)
  *  - renumber: lexicographic sort of output names → sequential
  *    `page_%04d.png` (`renumber_pages`, :358-391; two-phase rename is a
  *    filesystem concern — on an immutable table the rename IS the
  *    projection)
  *
  * The distributed form ([[splitPlan]]) is pure Column arithmetic
  * (codegen, no UDF): per page row it emits the composed crop box in
  * ORIGINAL image coordinates (PIL crop composition:
  * `img.crop(a).crop(b) == img.crop(a + b offset)` for in-bounds boxes),
  * so a production executor does ONE crop per output page. Equivalence
  * with the in-row reference port ([[splitBoxes]] / [[globalTrimBox]])
  * is property-tested in SplitSpreadSpec; the DuckDB oracle
  * (q_split_spread) hash-gates the whole plan including naming and
  * renumber.
  */
object SplitSpread {

  /** TrimConfig (split_spread.py:23-60); all values validated [0.0, 0.5)
    * like the reference's `validate_trim_value` (:64-76). */
  final case class TrimConfig(
      globalTop: Double = 0.0, globalBottom: Double = 0.0,
      globalLeft: Double = 0.0, globalRight: Double = 0.0,
      leftPageOuter: Double = 0.0, leftPageInner: Double = 0.0,
      rightPageInner: Double = 0.0, rightPageOuter: Double = 0.0) {
    for ((v, n) <- Seq(globalTop -> "global_top", globalBottom -> "global_bottom",
        globalLeft -> "global_left", globalRight -> "global_right",
        leftPageOuter -> "left_page_outer", leftPageInner -> "left_page_inner",
        rightPageInner -> "right_page_inner", rightPageOuter -> "right_page_outer"))
      require(v >= 0.0 && v < 0.5, s"Invalid trim value for $n: $v")
  }

  /** Half-open crop box, PIL convention (left, upper, right, lower). */
  final case class Box(left: Int, top: Int, right: Int, bottom: Int) {
    def width: Int = right - left
    def height: Int = bottom - top
  }

  /** apply_global_trim (split_spread.py:79-109) as a crop box on (w, h). */
  def globalTrimBox(w: Int, h: Int, cfg: TrimConfig): Box =
    Box((w * cfg.globalLeft).toInt, (h * cfg.globalTop).toInt,
      w - (w * cfg.globalRight).toInt, h - (h * cfg.globalBottom).toInt)

  /** split_spread (split_spread.py:174-216) as L/R crop boxes on the
    * (already globally trimmed) w x h image. */
  def splitBoxes(w: Int, h: Int, overlapPx: Int, leftOuter: Double,
      rightOuter: Double, leftInner: Double, rightInner: Double): (Box, Box) = {
    val midX = w / 2
    val half = midX
    val lo = (half * leftOuter).toInt
    val ro = (half * rightOuter).toInt
    val li = (half * leftInner).toInt
    val ri = (half * rightInner).toInt
    (Box(lo, 0, midX + overlapPx - li, h),
      Box(midX - overlapPx + ri, 0, w - ro, h))
  }

  /** One output page of the in-row plan (original-image coordinates). */
  final case class PageCrop(outName: String, side: String, box: Box)

  /** In-row reference port of the split_spread_pages per-image loop
    * (:219-355): global trim, then split (SPREAD) or pass-through
    * (SINGLE), boxes composed back into original coordinates. */
  def cropPage(pageName: String, w: Int, h: Int, mode: String,
      cfg: TrimConfig, overlapPx: Int): Vector[PageCrop] = {
    val g = globalTrimBox(w, h, cfg)
    val stem = pageName.stripSuffix(".png")
    if (mode == "spread") {
      val (l, r) = splitBoxes(g.width, g.height, overlapPx,
        cfg.leftPageOuter, cfg.rightPageOuter, cfg.leftPageInner, cfg.rightPageInner)
      Vector(
        PageCrop(s"${stem}_L.png", "L",
          Box(g.left + l.left, g.top + l.top, g.left + l.right, g.top + l.bottom)),
        PageCrop(s"${stem}_R.png", "R",
          Box(g.left + r.left, g.top + r.top, g.left + r.right, g.top + r.bottom)))
    } else
      Vector(PageCrop(pageName, "single", g))
  }

  /** Distributed crop plan over a page table
    * (doc_id, page_name, width, height): emits one row per OUTPUT page
    * with the composed original-coordinate crop box, output dims, and
    * the renumbered final name. Narrow except the renumber window
    * (per-doc row_number — pages per doc are bounded, and the partition
    * key is the same doc_id hash the extraction pipeline shuffles on).
    */
  def splitPlan(pages: DataFrame, mode: String, cfg: TrimConfig,
      overlapPx: Int): DataFrame = {
    require(mode == "spread" || mode == "single", s"Invalid mode '$mode'")
    val w = col("width"); val h = col("height")
    // global trim box (floor == Python int() for non-negative values)
    val gl = floor(w * cfg.globalLeft)
    val gt = floor(h * cfg.globalTop)
    val gr = w - floor(w * cfg.globalRight)
    val gb = h - floor(h * cfg.globalBottom)
    val tw = gr - gl
    val stem = regexp_replace(col("page_name"), "\\.png$", "")

    val out =
      if (mode == "single")
        pages.select(col("doc_id"), col("page_name"),
          col("page_name").as("out_name"), lit("single").as("side"),
          gl.as("crop_l"), gt.as("crop_t"), gr.as("crop_r"), gb.as("crop_b"))
      else {
        val midX = floor(tw / lit(2))
        val lo = floor(midX * cfg.leftPageOuter)
        val li = floor(midX * cfg.leftPageInner)
        val ri = floor(midX * cfg.rightPageInner)
        val ro = floor(midX * cfg.rightPageOuter)
        val sides = array(
          struct(lit("L").as("side"), (gl + lo).as("crop_l"),
            (gl + midX + overlapPx - li).as("crop_r")),
          struct(lit("R").as("side"), (gl + midX - overlapPx + ri).as("crop_l"),
            (gr - ro).as("crop_r")))
        pages.select(col("doc_id"), col("page_name"), stem.as("stem"),
          gt.as("crop_t"), gb.as("crop_b"), explode(sides).as("s"))
          .select(col("doc_id"), col("page_name"),
            concat(col("stem"), lit("_"), col("s.side"), lit(".png")).as("out_name"),
            col("s.side").as("side"),
            col("s.crop_l").as("crop_l"), col("crop_t"),
            col("s.crop_r").as("crop_r"), col("crop_b"))
      }

    val rn = row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(col("out_name")))
    out
      .withColumn("out_w", (col("crop_r") - col("crop_l")).cast("int"))
      .withColumn("out_h", (col("crop_b") - col("crop_t")).cast("int"))
      .withColumn("final_name", format_string("page_%04d.png", rn))
      .select(col("doc_id"), col("page_name"), col("out_name"), col("side"),
        col("crop_l").cast("int").as("crop_l"), col("crop_t").cast("int").as("crop_t"),
        col("crop_r").cast("int").as("crop_r"), col("crop_b").cast("int").as("crop_b"),
        col("out_w"), col("out_h"), col("final_name"))
  }
}
