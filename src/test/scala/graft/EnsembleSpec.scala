package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Region, TextWithBox}
import graft.vote.{Ensemble, Rover}

/** Legacy whole-page ensemble + quality/coverage/containment operators,
  * verified against reference-generated goldens + unit semantics. */
class EnsembleSpec extends AnyFunSuite {

  test("garbage/quality filters match python code-point + isalnum/\\w semantics") {
    // expected verdicts from RUNNING the reference's is_garbage (line +
    // page), is_low_quality and calc_non_char_ratio on these inputs:
    // code-point lengths, isalnum incl. Nl/No (①, Ⅷ, ²), python \w
    val cases = Seq(
      // text, line_garbage, page_garbage, low_quality, non_char
      ("🎉🎉🎉🎉🎉", true, false, true, 1.0),
      ("𠮷𠮷𠮷𠮷𠮷𠮷", true, false, true, 0.0),
      ("①②③", true, false, true, 0.0),
      ("Ⅷ²½", true, false, true, 0.0),
      ("🎉a🎉b", true, false, true, 0.5),
      ("𠮷野家だよ", false, false, true, 0.0),
      ("ab🎉", true, false, true, 1.0 / 3),
      ("漢" * 3 + "🎉" * 60, true, true, true, 60.0 / 63),
      ("①" * 12, true, true, false, 0.0))
    cases.foreach { case (t, lg, pg, lq, nc) =>
      assert(graft.vote.Rover.isGarbage(t, 0.9) == lg, s"line_garbage('$t')")
      assert(graft.vote.Ensemble.isGarbagePage(t) == pg, s"page_garbage('$t')")
      assert(graft.vote.Ensemble.isLowQuality(t) == lq, s"low_quality('$t')")
      assert(math.abs(graft.vote.Ensemble.nonCharRatio(t) - nc) < 1e-9, s"non_char('$t')")
    }
  }

  test("merge_by_voting matches reference goldens (20 pages)") {
    Fixtures.resourceLines("/fixtures/ensemble.golden.tsv").foreach { line =>
      val f = line.split("\t", -1)
      val results = Fixtures.unesc(f(1)).split("\u0001").toVector.map { kv =>
        val i = kv.indexOf('=')
        (kv.substring(0, i), kv.substring(i + 1))
      }
      val valid = results.filter(_._2.nonEmpty)
      val (merged, source, _) =
        if (valid.isEmpty) ("", "none", Map.empty[String, Int])
        else Ensemble.voteBestResult(valid)
      assert(merged == Fixtures.unesc(f(2)), s"case ${f(0)} merged")
      assert(source == f(3), s"case ${f(0)} source")
    }
  }

  test("page-level is_garbage matches reference goldens") {
    Fixtures.resourceLines("/fixtures/garbage_page.golden.tsv").foreach { line =>
      val f = line.split("\t", -1)
      assert(Ensemble.isGarbagePage(Fixtures.unesc(f(0))) == (f(1) == "true"),
        s"is_garbage(${f(0)})")
    }
  }

  test("low-quality check + non-char ratio (layout_ocr_utils.py:32-66)") {
    assert(Ensemble.isLowQuality(""))
    assert(Ensemble.isLowQuality("短い")) // < 10 chars
    assert(Ensemble.isLowQuality("!@#$%^&*()!@#$%")) // non-char ratio > 0.5
    assert(!Ensemble.isLowQuality("これは十分に長い日本語のテキストです"))
  }

  test("fallback chain: first quality text wins, terminal needs non-empty") {
    assert(Ensemble.ocrWithFallback(Vector(
      "yomitoku" -> "これは十分に長い日本語のテキストです",
      "paddleocr" -> "別のテキスト", "tesseract" -> "x")) ==
      (("これは十分に長い日本語のテキストです", "yomitoku")))
    assert(Ensemble.ocrWithFallback(Vector(
      "yomitoku" -> "短い", "paddleocr" -> "これも十分に長い日本語のテキストです",
      "tesseract" -> "x")) ==
      (("これも十分に長い日本語のテキストです", "paddleocr")))
    assert(Ensemble.ocrWithFallback(Vector(
      "yomitoku" -> "短い", "paddleocr" -> "", "tesseract" -> "x")) == (("x", "tesseract")))
    assert(Ensemble.ocrWithFallback(Vector("yomitoku" -> "", "tesseract" -> "")) ==
      (("", "none")))
  }

  test("coverage + should_fallback (layout_ocr_utils.py:83-136)") {
    val full = Seq(Region("TEXT", 0, 0, 100, 100, 0.9))
    assert(Ensemble.coverage(full, 100, 100) == 1.0)
    assert(!Ensemble.shouldFallback(full, 100, 100))
    assert(Ensemble.shouldFallback(Seq(Region("TEXT", 0, 0, 10, 10, 0.9)), 100, 100)) // 1% < 30%
    assert(Ensemble.shouldFallback(Seq(Region("FIGURE", 0, 0, 100, 100, 0.9)), 100, 100))
    assert(Ensemble.shouldFallback(Nil, 100, 100))
  }

  test("figure containment filter (engines/core.py:144-196)") {
    val items = Seq(
      TextWithBox("inside", 10, 10, 20, 20, 0.9),
      TextWithBox("outside", 200, 200, 220, 220, 0.9))
    val figures = Seq((0, 0, 100, 100))
    assert(Ensemble.filterItemsByFigures(items, figures).map(_.text) == Seq("outside"))
    assert(Ensemble.filterItemsByFigures(items, Nil).size == 2)
  }

  test("greedy overlap filter: conf desc, union-IoU > 0.5 dropped") {
    val rs = Seq(
      Region("TEXT", 0, 0, 100, 100, 0.5),
      Region("TEXT", 0, 0, 100, 100, 0.95), // same box, higher conf kept
      Region("TEXT", 500, 500, 600, 600, 0.3)) // below min_confidence 0.4
    val kept = Ensemble.filterOverlappingRegions(rs)
    assert(kept.map(_.confidence) == Vector(0.95))
  }

  test("bbox containment threshold 0.7 (voting.py:77-100)") {
    val outer = Region("TEXT", 0, 0, 100, 100, 1.0)
    assert(Ensemble.bboxContains(outer, Region("TEXT", 10, 10, 90, 90, 1.0)))
    assert(!Ensemble.bboxContains(outer, Region("TEXT", 50, 50, 200, 200, 1.0))) // ~17% inside
  }

  test("confidence/area filter (layout/figures.py:136-166)") {
    val rs = Seq(
      Region("FIGURE", 0, 0, 200, 200, 0.9), // 4% of page, kept
      Region("FIGURE", 0, 0, 50, 50, 0.9), // 0.25% < 1%, dropped
      Region("FIGURE", 0, 0, 500, 500, 0.1)) // conf < 0.3, dropped
    assert(Ensemble.confidenceAreaFilter(rs, 1000, 1000).size == 1)
  }

  test("400 random inputs: quality predicates + bbox math == reference") {
    // differential fixture from RUNNING voting.is_garbage/bbox_iou/
    // bbox_contains, layout_ocr_utils.calc_non_char_ratio/is_low_quality,
    // and rover line_processing.is_garbage (python \w incl. Nl/No,
    // repeat-run boundaries, degenerate boxes) —
    // scripts/gen_predicates_random.py
    var checked = 0
    Fixtures.resourceLines("/fixtures/predicates_random.golden.tsv")
      .filter(_.nonEmpty).foreach { row =>
        val f = row.split("\t", -1)
        val c = f(1)
        f(0) match {
          case "T" =>
            val t = Fixtures.unesc(f(2))
            assert(Ensemble.isGarbagePage(t) == (f(4) == "1"), s"case $c page garbage '$t'")
            assert(math.abs(Ensemble.nonCharRatio(t) - f(5).toDouble) < 1e-12,
              s"case $c nonCharRatio '$t': got ${Ensemble.nonCharRatio(t)} exp ${f(5)}")
            assert(Ensemble.isLowQuality(t) == (f(6) == "1"), s"case $c low quality '$t'")
            assert(Rover.isGarbage(t, f(3).toDouble) == (f(7) == "1"),
              s"case $c line garbage '$t' conf=${f(3)}")
            checked += 1
          case "B" =>
            val a = Region("X", f(2).toInt, f(3).toInt, f(4).toInt, f(5).toInt, 1.0)
            val b = Region("X", f(6).toInt, f(7).toInt, f(8).toInt, f(9).toInt, 1.0)
            assert(math.abs(graft.layout.ReadingOrder.iouUnion(a, b) - f(11).toDouble) < 1e-12,
              s"case $c iou: got ${graft.layout.ReadingOrder.iouUnion(a, b)} exp ${f(11)}")
            assert(Ensemble.bboxContains(a, b, f(10).toDouble) == (f(12) == "1"),
              s"case $c contains")
        }
      }
    assert(checked == 400)
  }

  test("300 random pages: voteBestResult == reference vote_best_result") {
    // differential fixture from RUNNING voting.py (matrix over non-empty
    // results, thresholds 0.5/0.7/0.9, autojunk-straddling lengths,
    // failed engines, ties broken by first-max score) —
    // scripts/gen_vote_random.py
    val lines = Fixtures.resourceLines("/fixtures/vote_random.golden.tsv")
    var threshold = 0.7
    var results = Vector.empty[(String, String)]
    var cases = 0
    lines.filter(_.nonEmpty).foreach { line =>
      val f = line.split("\t", -1)
      f(0) match {
        case "C" =>
          threshold = f(2).toDouble
          results = Vector.empty
        case "E" =>
          results :+= (f(2) -> Fixtures.unesc(f(3)))
        case "R" =>
          val (text, engine, votes) = Ensemble.voteBestResult(results, threshold)
          val expVotes: Map[String, Int] =
            if (f(4).isEmpty) Map.empty
            else f(4).split(',').map { kv =>
              val Array(k, v) = kv.split(':'); k -> v.toInt
            }.toMap
          val c = f(1)
          assert(engine == f(2), s"case $c engine: got $engine exp ${f(2)}")
          assert(text == Fixtures.unesc(f(3)), s"case $c text mismatch")
          assert(votes == expVotes, s"case $c votes: got $votes exp $expVotes")
          cases += 1
      }
    }
    assert(cases == 300)
  }

  test("equal-text shortcut == full matcher: ratio(a,a) is 1.0 even under autojunk") {
    // the calculateSimilarity a==b short-circuit is sound only if the
    // FULL matcher returns exactly 1.0 for identical inputs — including
    // strings where the autojunk popularity heuristic marks every
    // element junk (>=200 chars, element freq >1%). Pin it adversarially.
    val rng = new scala.util.Random(99)
    val adversarial = Seq("a" * 300, "ab" * 150, ("a" * 50 + "b") * 10,
      "x" * 199, "x" * 200, "hello world " * 40) ++
      Vector.fill(200)(Vector.fill(1 + rng.nextInt(400))(
        "abc".charAt(rng.nextInt(3))).mkString)
    adversarial.foreach { a =>
      assert(graft.text.SeqRatio.ratio(a, a) == 1.0, s"len ${a.length}")
      assert(Ensemble.calculateSimilarity(a, a) == 1.0)
    }
  }

  test("word->line clustering variant (runners.py:89-192)") {
    val words = Seq(
      TextWithBox("界", 50, 98, 60, 118, 0.8),
      TextWithBox("世", 10, 100, 20, 120, 0.9),
      TextWithBox("次行", 10, 200, 30, 220, 0.7))
    val lines = Rover.clusterWordsToLines(words)
    assert(lines.map(_.text) == Vector("世界", "次行"))
    assert(lines.head.x1 == 10 && lines.head.x2 == 60)
    assert(math.abs(lines.head.confidence - 0.85) < 1e-9)
  }
}
