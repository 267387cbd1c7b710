package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.TextWithBox
import graft.vote.Rover

/** ROVER core parity vs reference-generated goldens
  * (scripts in-repo; reference rover_merge run on 30 random pages),
  * plus unit cases ported from /root/reference/test_rover.py:20-60 and
  * line_processing garbage rules. */
class RoverSpec extends AnyFunSuite {

  test("rover_merge matches reference goldens (30 multi-engine pages)") {
    val caseRows = Fixtures.resourceLines("/fixtures/rover.cases.tsv").map { line =>
      val f = line.split("\t", -1)
      (f(0).toInt, f(1), TextWithBox(Fixtures.unesc(f(2)), f(3).toInt, f(4).toInt, f(5).toInt,
        f(6).toInt, f(7).toDouble))
    }
    val expected = Fixtures.resourceLines("/fixtures/rover.expected.tsv").map { line =>
      val f = line.split("\t", -1)
      (f(0).toInt, Fixtures.unesc(f(1)), f(2).toInt, f(3))
    }
    expected.foreach { case (caseId, expText, expGaps, expContrib) =>
      val engines = Vector("yomitoku", "paddleocr", "easyocr").map { e =>
        e -> caseRows.collect { case (c, eng, it) if c == caseId && eng == e => it }.toVector
      }
      val res = Rover.roverMerge(engines)
      assert(res.text == expText, s"case $caseId text")
      assert(res.gapsFilled == expGaps, s"case $caseId gaps")
      val contrib = res.engineContributions.toVector.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(",")
      assert(contrib == expContrib, s"case $caseId contributions")
    }
  }

  test("rover_merge matches reference on 200 random multi-engine pages") {
    // differential fixture from RUNNING rover_merge (scripts/
    // gen_rover_random.py): jittered y-bands vs the 30px tolerance,
    // split boxes (within-line x-sort), absent engines, missed lines
    // (gap filling), garbage items, noisy per-engine mutations
    val lines = Fixtures.resourceLines("/fixtures/rover_random.golden.tsv")
    val items = collection.mutable.Map[Int, Vector[(String, TextWithBox)]]()
    var checked = 0
    lines.filter(_.nonEmpty).foreach { line =>
      val f = line.split("\t", -1)
      f(0) match {
        case "I" =>
          val c = f(1).toInt
          val it = TextWithBox(Fixtures.unesc(f(3)), f(4).toInt, f(5).toInt,
            f(6).toInt, f(7).toInt, f(8).toDouble)
          items(c) = items.getOrElse(c, Vector.empty) :+ (f(2) -> it)
        case "R" =>
          val c = f(1).toInt
          // pass exactly the engines the reference dict contained (an
          // absent engine differs observably from a present-but-empty
          // one: both sides seed contributions from the PASSED engines)
          val engines = Vector("yomitoku", "paddleocr", "easyocr")
            .map(e => e -> items.getOrElse(c, Vector.empty).collect { case (`e`, it) => it })
            .filter(_._2.nonEmpty)
          val res = Rover.roverMerge(engines)
          assert(res.text == Fixtures.unesc(f(2)), s"case $c text")
          assert(res.gapsFilled == f(3).toInt, s"case $c gaps")
          val contrib = res.engineContributions.toVector.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(",")
          assert(contrib == f(4), s"case $c contributions: got $contrib exp ${f(4)}")
          checked += 1
      }
    }
    assert(checked == 200)
  }

  test("is_garbage rules (line_processing.py:49-94)") {
    assert(Rover.isGarbage("", 1.0))
    assert(Rover.isGarbage("   ", 1.0))
    assert(Rover.isGarbage("こんにちは", 0.4)) // low confidence
    assert(Rover.isGarbage("abcde", 1.0)) // no JP, len <= 5
    assert(!Rover.isGarbage("abcdef", 1.0)) // no JP but len > 5
    assert(Rover.isGarbage("ああああああ", 1.0)) // same char x5 run
    assert(Rover.isGarbage("・・…!!", 1.0)) // punctuation only
    assert(!Rover.isGarbage("日本語のテキスト", 0.9))
  }

  test("normalize_confidence ranges") {
    assert(Rover.normalizeConfidence(0.4, "yomitoku") == 0.0)
    assert(Rover.normalizeConfidence(1.0, "yomitoku") == 1.0)
    assert(math.abs(Rover.normalizeConfidence(0.925, "paddleocr") - 0.5) < 1e-9)
    assert(Rover.normalizeConfidence(0.1, "easyocr") == 0.0) // clamped
    assert(Rover.normalizeConfidence(0.5, "unknown") == 0.5)
  }

  test("cluster_lines_by_y: running mean, x-sort within line") {
    val items = Vector(
      TextWithBox("B", 50, 100, 60, 120, 0.9),
      TextWithBox("A", 0, 102, 10, 118, 0.8),
      TextWithBox("C", 0, 200, 10, 220, 0.7)
    )
    val lines = Rover.clusterLinesByY(items)
    assert(lines.map(_.text) == Vector("AB", "C"))
    assert(math.abs(lines.head.confidence - 0.85) < 1e-9)
  }

  test("align_lines_by_y: one line per engine per cluster, advance quirk") {
    val mk = (t: String, y: Int) => Rover.OCRLine(Vector(TextWithBox(t, 0, y - 10, 10, y + 10, 1.0)), "", y, 1.0)
    val aligned = Rover.alignLinesByY(Vector(
      "yomitoku" -> Vector(mk("a", 100), mk("b", 200)),
      "easyocr" -> Vector(mk("a2", 105), mk("b2", 206))
    ))
    assert(aligned.length == 2)
    assert(aligned.head.lines.map(_._1) == Vector("yomitoku", "easyocr"))
  }

  test("single-engine line returns raw confidence (vote_line_text fast path)") {
    val line = Rover.OCRLine(Vector(TextWithBox("単独の行テキスト", 0, 0, 10, 20, 0.77)), "yomitoku", 10, 0.77)
    val (text, engines, conf) = Rover.voteLineText(
      Rover.AlignedLine(Vector("yomitoku" -> Some(line)), 10.0))
    assert(text == "単独の行テキスト" && engines == Vector("yomitoku") && conf == 0.77)
  }
}
