package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.layout.SplitSpread
import graft.layout.SplitSpread.TrimConfig

/** The DISTRIBUTED image-geometry plans vs their fixture-gated in-row
  * ports: [[SplitSpread.splitPlan]] (pure Column arithmetic + renumber
  * window) must agree row-for-row with [[SplitSpread.cropPage]] (the
  * reference-differential-tested port), and
  * [[graft.multimodal.Media.framePlan]] must satisfy the ffmpeg sampling
  * contract. Plan-shape asserts pin the scale story: one doc_id-hash
  * exchange for the renumber window, nothing else. */
class ImagePlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("graft-image-plan")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val cfg = TrimConfig(
    globalTop = 0.03, globalBottom = 0.02, globalLeft = 0.04, globalRight = 0.01,
    leftPageOuter = 0.02, leftPageInner = 0.015,
    rightPageInner = 0.025, rightPageOuter = 0.01)

  private def pageTable(n: Int) = {
    val sp = spark; import sp.implicits._
    val rng = new scala.util.Random(42)
    (0 until n).map { i =>
      (i.toLong / 3, f"page_${i % 3 + 1}%04d.png",
        2 + rng.nextInt(4000), 2 + rng.nextInt(3000))
    }.toDF("doc_id", "page_name", "width", "height")
  }

  for (mode <- Seq("spread", "single")) {
    test(s"splitPlan == in-row cropPage + renumber, mode=$mode (300 random pages)") {
      val pages = pageTable(300)
      val got = SplitSpread.splitPlan(pages, mode, cfg, overlapPx = 8)
        .collect().map(r => (r.getLong(0), r.getString(2)) ->
          (r.getString(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7),
            r.getInt(8), r.getInt(9), r.getString(10))).toMap
      val inRow = pages.collect().flatMap { r =>
        SplitSpread.cropPage(r.getString(1), r.getInt(2), r.getInt(3),
          mode, cfg, overlapPx = 8)
          .map(pc => (r.getLong(0), pc))
      }
      // renumber: lexicographic out_name order per doc -> page_%04d.png
      val expected = inRow.groupBy(_._1).toSeq.flatMap { case (docId, pcs) =>
        pcs.toVector.map(_._2).sortBy(_.outName).zipWithIndex.map { case (pc, i) =>
          (docId, pc.outName) -> (pc.side, pc.box.left, pc.box.top, pc.box.right,
            pc.box.bottom, pc.box.width, pc.box.height, f"page_${i + 1}%04d.png")
        }
      }.toMap
      assert(got.size == expected.size)
      expected.foreach { case (k, v) =>
        assert(got(k) == v, s"mismatch at $k: got ${got(k)} want $v")
      }
    }
  }

  test("splitPlan shuffles ONCE, on doc_id (the renumber window)") {
    val plan = SplitSpread.splitPlan(pageTable(30), "spread", cfg, 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"want exactly 1 hash exchange, got $exchanges:\n$plan")
    assert(plan.contains("hashpartitioning(doc_id"), plan)
  }

  test("framePlan: ffmpeg fps=1/interval contract (count, naming, ts, src idx)") {
    val sp = spark; import sp.implicits._
    val meta = Seq(
      ("d1", "v1", "video", 240, true),   // 8s @30fps, interval 2 -> 4 frames
      ("d1", "v2", "video", 1, true),     // shorter than one interval -> 1 frame
      ("d1", "v3", "video", 61, true),    // 2.03s -> ceil -> 2 frames
      ("d2", "i1", "image", 1, true),     // not a video -> excluded
      ("d2", "v4", "video", 100, false),  // decode failed -> excluded
      ("d2", "v5", "video", 0, true))     // zero frames decode ok -> ffmpeg emits nothing
      .toDF("doc_id", "media_ref", "media_kind", "n_frames", "ok")
    val rows = graft.multimodal.Media.framePlan(meta, intervalSec = 2.0, srcFps = 30.0)
      .orderBy("media_ref", "frame_ord").collect()
    assert(rows.map(r => (r.getString(1), r.getLong(2), r.getString(3),
      r.getDouble(4), r.getInt(5))).toSeq == Seq(
      ("v1", 1L, "frame_0001.png", 0.0, 0), ("v1", 2L, "frame_0002.png", 2.0, 60),
      ("v1", 3L, "frame_0003.png", 4.0, 120), ("v1", 4L, "frame_0004.png", 6.0, 180),
      ("v2", 1L, "frame_0001.png", 0.0, 0),
      ("v3", 1L, "frame_0001.png", 0.0, 0), ("v3", 2L, "frame_0002.png", 2.0, 60)))
  }

  test("framePlan is narrow: no exchange at all") {
    val sp = spark; import sp.implicits._
    val meta = Seq(("d1", "v1", "video", 240, true))
      .toDF("doc_id", "media_ref", "media_kind", "n_frames", "ok")
    val plan = graft.multimodal.Media.framePlan(meta, 2.0, 30.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
