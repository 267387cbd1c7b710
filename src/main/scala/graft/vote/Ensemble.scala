package graft.vote

import java.util.regex.Pattern
import scala.collection.mutable
import graft.model.{Region, TextWithBox}
import graft.text.{Py, SeqRatio}

/** Legacy whole-page ensemble voting + quality checks + fallback chain.
  * Faithful ports of src/ocr_ensemble/voting.py, src/layout_ocr_utils.py,
  * src/ocr_integrated_utils.py:11-60, src/layout_ocr.py:49-73 (fallback
  * selection re-expressed over precomputed engine texts).
  */
object Ensemble {

  private val U = Pattern.UNICODE_CHARACTER_CLASS
  private val repeat10P = Pattern.compile("(.)\\1{9,}")
  private val jaCharP = Pattern.compile("[\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FFF]")
  private val special10P = Pattern.compile("[^\\p{L}\\p{Nd}\\p{Nl}\\p{No}_\\s\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FFF]{10,}", U)

  /** Page-level is_garbage (ocr_ensemble/voting.py:13-47). */
  def isGarbagePage(text: String, minLength: Int = 50, jaRatioThreshold: Double = 0.1): Boolean = {
    if (text == null || text.isEmpty) return true
    if (repeat10P.matcher(text).find()) return true
    // python len(text) counts code points (emoji/rare kanji = 1)
    if (graft.text.Py.len(text) >= minLength) {
      val m = jaCharP.matcher(text)
      var jaChars = 0
      while (m.find()) jaChars += 1
      if (jaChars.toDouble / graft.text.Py.len(text) < jaRatioThreshold) return true
    }
    special10P.matcher(text).find()
  }

  /** calc_non_char_ratio (layout_ocr_utils.py:32-46): share of chars that
    * are neither Japanese nor \w. */
  private val charP = Pattern.compile("[\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FFF\\p{L}\\p{Nd}\\p{Nl}\\p{No}_]", U)
  def nonCharRatio(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val m = charP.matcher(text)
    var chars = 0
    while (m.find()) chars += 1
    1.0 - chars.toDouble / graft.text.Py.len(text) // python len = code points
  }

  /** is_low_quality (layout_ocr_utils.py:49-66). */
  def isLowQuality(text: String, minLength: Int = 10, maxNonCharRatio: Double = 0.5): Boolean = {
    if (text == null || Py.strip(text).isEmpty) return true
    if (Py.len(Py.strip(text)) < minLength) return true
    nonCharRatio(text) > maxNonCharRatio
  }

  /** calculate_coverage (layout_ocr_utils.py:83-98). */
  def coverage(regions: Seq[Region], pageWidth: Int, pageHeight: Int): Double = {
    if (regions.isEmpty || pageWidth <= 0 || pageHeight <= 0) return 0.0
    val pageArea = pageWidth.toDouble * pageHeight
    regions.iterator.map(r => (r.x2 - r.x1).toDouble * (r.y2 - r.y1)).sum / pageArea
  }

  /** should_fallback (layout_ocr_utils.py:101-136): whole-page OCR when
    * no OCRable regions or coverage < threshold. */
  def shouldFallback(regions: Seq[Region], pageWidth: Int, pageHeight: Int,
      threshold: Double = 0.3): Boolean = {
    if (regions.isEmpty) return true
    val ocrRegions = regions.filterNot(r => r.kind == "ABANDON" || r.kind == "FIGURE")
    if (ocrRegions.isEmpty) return true
    coverage(ocrRegions, pageWidth, pageHeight) < threshold
  }

  /** bbox_contains (voting.py:77-100): inner mostly inside outer. */
  def bboxContains(outer: Region, inner: Region, threshold: Double = 0.7): Boolean = {
    val x1 = math.max(outer.x1, inner.x1); val y1 = math.max(outer.y1, inner.y1)
    val x2 = math.min(outer.x2, inner.x2); val y2 = math.min(outer.y2, inner.y2)
    if (x2 <= x1 || y2 <= y1) return false
    val inter = (x2 - x1).toDouble * (y2 - y1)
    val innerArea = (inner.x2 - inner.x1).toDouble * (inner.y2 - inner.y1)
    innerArea > 0 && inter / innerArea >= threshold
  }

  /** _is_item_inside_figures / _filter_items_by_figures
    * (rover/engines/core.py:144-196): drop items whose center lies in any
    * figure bbox. In Spark SQL terms this is
    * filter(!exists(figures, f -> contains(f, center(item)))). */
  def itemInsideFigures(item: TextWithBox, figures: Seq[(Int, Int, Int, Int)]): Boolean = {
    if (figures.isEmpty) return false
    val cx = (item.x1 + item.x2) / 2.0
    val cy = (item.y1 + item.y2) / 2.0
    figures.exists { case (fx1, fy1, fx2, fy2) => fx1 <= cx && cx <= fx2 && fy1 <= cy && cy <= fy2 }
  }

  def filterItemsByFigures(items: Seq[TextWithBox],
      figures: Seq[(Int, Int, Int, Int)]): Seq[TextWithBox] =
    if (figures.isEmpty) items else items.filterNot(itemInsideFigures(_, figures))

  /** filter_overlapping_regions (ocr_integrated_utils.py:23-60): conf
    * filter, sort conf desc (stable), greedy keep non-overlapping
    * (union-IoU > threshold drops). */
  def filterOverlappingRegions(regions: Seq[Region], iouThreshold: Double = 0.5,
      minConfidence: Double = 0.4): Vector[Region] = {
    val valid = regions.filter(_.confidence >= minConfidence)
      .sortBy(r => -r.confidence) // stable, like list.sort(reverse=True)
    val kept = mutable.ArrayBuffer.empty[Region]
    valid.foreach { r =>
      if (!kept.exists(k => graft.layout.ReadingOrder.iouUnion(r, k) > iouThreshold)) kept += r
    }
    kept.toVector
  }

  /** YOLO confidence/area filter (layout/figures.py:136-166): conf >=
    * minConfidence handled by the detector; area >= minArea fraction of
    * the page. */
  def confidenceAreaFilter(regions: Seq[Region], pageWidth: Int, pageHeight: Int,
      minConfidence: Double = 0.3, minArea: Double = 0.01): Seq[Region] = {
    val minAreaPx = pageWidth.toDouble * pageHeight * minArea
    regions.filter(r => r.confidence >= minConfidence &&
      (r.x2 - r.x1).toDouble * (r.y2 - r.y1) >= minAreaPx)
  }

  // ---- whole-page similarity voting (voting.py:143-253) -------------------

  def calculateSimilarity(a: String, b: String): Double = {
    if ((a == null || a.isEmpty) && (b == null || b.isEmpty)) return 1.0
    if (a == null || a.isEmpty || b == null || b.isEmpty) return 0.0
    // equal texts short-circuit the quadratic matcher: ratio of identical
    // sequences is exactly 1.0 even under the autojunk popularity
    // heuristic (the junk-extension phase of findLongestMatch covers the
    // whole range; property-pinned vs the full matcher on adversarial
    // popular-heavy strings in EnsembleSpec). At corpus scale engines
    // frequently agree verbatim, and the similarity matrix always holds
    // n self-pairs — this removes whole-matcher runs, not precision.
    if (a == b) return 1.0
    SeqRatio.ratio(a, b)
  }

  def similarityMatrix(results: Vector[(String, String)]): Map[(String, String), Double] = {
    // memo on the TEXT pair: when engines agree verbatim (the common case
    // at corpus scale), their rows ask the matcher for the same (t1, t2)
    // — calculateSimilarity is a pure function of the texts, so reuse is
    // value-identical and the quadratic pass runs once per DISTINCT pair
    val memo = scala.collection.mutable.HashMap.empty[(String, String), Double]
    (for ((e1, t1) <- results; (e2, t2) <- results)
      yield (e1, e2) -> memo.getOrElseUpdate((t1, t2), calculateSimilarity(t1, t2))).toMap
  }

  /** vote_best_result (voting.py:165-219): most votes (pairwise sim >=
    * threshold), tie-break avg similarity, no-agreement falls back to the
    * fixed engine priority. Python max() first-max semantics preserved
    * via insertion-ordered traversal. */
  def voteBestResult(results: Vector[(String, String)], threshold: Double = 0.7)
      : (String, String, Map[String, Int]) = {
    val engines = results.collect { case (e, t) if t != null && t.nonEmpty => e }
    if (engines.isEmpty) return ("", "none", Map.empty)
    val texts = results.toMap
    if (engines.length == 1) return (texts(engines.head), engines.head, Map(engines.head -> 1))
    val matrix = similarityMatrix(results.filter(r => r._2 != null && r._2.nonEmpty))
    val scores = engines.map { e =>
      val others = engines.filter(_ != e).map(o => matrix((e, o)))
      e -> (if (others.nonEmpty) others.sum / others.length else 0.0)
    }.toMap
    val votes = engines.map { e =>
      e -> engines.count(o => o != e && matrix((e, o)) >= threshold)
    }
    val voteMap = votes.toMap
    val maxVotes = votes.map(_._2).max
    if (maxVotes > 0) {
      val winners = votes.collect { case (e, v) if v == maxVotes => e }
      // Python max(key=score): first max in winners order
      val winner = winners.foldLeft(winners.head)((b, e) => if (scores(e) > scores(b)) e else b)
      (texts(winner), winner, voteMap)
    } else {
      val priority = Vector("yomitoku", "paddleocr", "easyocr", "tesseract")
      priority.find(e => engines.contains(e) && texts(e).nonEmpty) match {
        case Some(e) => (texts(e), e, voteMap)
        case None    => (texts(engines.head), engines.head, voteMap)
      }
    }
  }

  /** Engine fallback chain (layout_ocr.py:49-73) over precomputed texts:
    * first engine in the chain whose text passes the quality check; the
    * terminal engine only needs non-emptiness. SQL form:
    * coalesce(when(quality_ok(y), y), when(quality_ok(p), p), t). */
  def ocrWithFallback(texts: Vector[(String, String)]): (String, String) = {
    texts.zipWithIndex.foreach { case ((engine, text), i) =>
      val last = i == texts.length - 1
      if (text != null && text.nonEmpty && (last || !isLowQuality(text)))
        return (text, engine)
    }
    ("", "none")
  }
}
