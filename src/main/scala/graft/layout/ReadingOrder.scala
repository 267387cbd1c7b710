package graft.layout

import graft.model.Region

/** Reading-order resolution + overlap removal.
  * Faithful port of src/layout/reading_order.py:10-142 — the reference's
  * 1-level XY-cut special case (split at page mid-x into L/R columns,
  * lexicographic (y, type-priority, x) sort, concat L then R).
  *
  * Regions per page are tiny (~10s), so this runs in-row on the page's
  * region array — never a join/shuffle (SURVEY §2.2, §2.6).
  */
object ReadingOrder {

  /** TYPE_PRIORITY (reading_order.py:10-19); unknown types -> 99. */
  val TypePriority: Map[String, Int] = Map(
    "TITLE" -> 0, "TEXT" -> 1, "CAPTION" -> 2, "FOOTNOTE" -> 3,
    "FIGURE" -> 4, "TABLE" -> 5, "FORMULA" -> 6, "ABANDON" -> 7
  )

  /** sort_reading_order (reading_order.py:22-65). */
  def sortReadingOrder(regions: Seq[Region], pageWidth: Int): Vector[Region] = {
    if (regions.isEmpty) return regions.toVector
    val midX = pageWidth / 2.0
    val (left, right) = regions.partition(r => (r.x1 + r.x2) / 2.0 < midX)
    def key(r: Region): (Int, Int, Int) = (r.y1, TypePriority.getOrElse(r.kind, 99), r.x1)
    (left.sortBy(key) ++ right.sortBy(key)).toVector
  }

  /** iou (reading_order.py:68-94): intersection / min(area1, area2) —
    * containment-sensitive. */
  def iouMinArea(r1: Region, r2: Region): Double = {
    val x1 = math.max(r1.x1, r2.x1)
    val y1 = math.max(r1.y1, r2.y1)
    val x2 = math.min(r1.x2, r2.x2)
    val y2 = math.min(r1.y2, r2.y2)
    if (x1 >= x2 || y1 >= y2) return 0.0
    val inter = (x2 - x1).toDouble * (y2 - y1)
    val area1 = (r1.x2 - r1.x1).toDouble * (r1.y2 - r1.y1)
    val area2 = (r2.x2 - r2.x1).toDouble * (r2.y2 - r2.y1)
    inter / math.min(area1, area2)
  }

  /** Classic IoU (intersection/union), float-safe
    * (src/ocr_ensemble/voting.py:50-74). */
  def iouUnion(r1: Region, r2: Region): Double = {
    val x1 = math.max(r1.x1, r2.x1)
    val y1 = math.max(r1.y1, r2.y1)
    val x2 = math.min(r1.x2, r2.x2)
    val y2 = math.min(r1.y2, r2.y2)
    if (x1 >= x2 || y1 >= y2) return 0.0
    val inter = (x2 - x1).toDouble * (y2 - y1)
    val area1 = (r1.x2 - r1.x1).toDouble * (r1.y2 - r1.y1)
    val area2 = (r2.x2 - r2.x1).toDouble * (r2.y2 - r2.y1)
    val union = area1 + area2 - inter
    if (union <= 0) 0.0 else inter / union
  }

  /** remove_overlaps (reading_order.py:97-142): pairwise min-area IoU >= 0.5
    * and same type -> drop the lower-confidence region. */
  def removeOverlaps(regions: Seq[Region]): Vector[Region] = {
    if (regions.isEmpty) return Vector.empty
    val arr = regions.toIndexedSeq
    val removed = scala.collection.mutable.HashSet.empty[Int]
    val result = Vector.newBuilder[Region]
    var i = 0
    while (i < arr.length) {
      if (!removed.contains(i)) {
        val r1 = arr(i)
        var keep = true
        var j = i + 1
        while (j < arr.length && keep) {
          if (!removed.contains(j) && r1.kind == arr(j).kind) {
            if (iouMinArea(r1, arr(j)) >= 0.5) {
              if (r1.confidence < arr(j).confidence) { keep = false; removed += i }
              else removed += j
            }
          }
          j += 1
        }
        if (keep) result += r1
      }
      i += 1
    }
    result.result()
  }
}
