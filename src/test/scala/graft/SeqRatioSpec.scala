package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.SeqRatio

/** Parity with CPython difflib.SequenceMatcher (goldens generated from
  * the stdlib), plus algebraic properties on seeded random strings. */
class SeqRatioSpec extends AnyFunSuite {

  test("500 random pairs: ratio AND opcodes == CPython difflib exactly") {
    // differential fixture from RUNNING SequenceMatcher (scripts/
    // gen_difflib_random.py): autojunk-straddling lengths in CODE POINTS,
    // popularity-heavy tiny alphabets, repeated-char strings, non-BMP —
    // directly gates the primitive-array findLongestMatch rewrite
    var checked = 0
    Fixtures.resourceLines("/fixtures/difflib_random.golden.tsv")
      .filter(_.nonEmpty).foreach { row =>
        val f = row.split("\t", -1)
        val c = f(1)
        val a = Fixtures.unesc(f(2))
        val b = Fixtures.unesc(f(3))
        val m = new SeqRatio.Matcher(a, b)
        assert(m.ratio == f(4).toDouble,
          s"case $c ratio: got ${m.ratio} exp ${f(4)} (la=${a.length} lb=${b.length})")
        val gotOps = m.opcodes.map(o => s"${o.tag},${o.i1},${o.i2},${o.j1},${o.j2}")
          .mkString(";")
        assert(gotOps == f(5), s"case $c opcodes:\n got $gotOps\n exp ${f(5)}")
        checked += 1
      }
    assert(checked == 500)
  }

  test("non-BMP: ratios count CODE POINTS like python (incl. autojunk flip)") {
    // golden values computed by running difflib.SequenceMatcher on these
    // exact pairs; a UTF-16 port gets every one wrong (the last one
    // catastrophically: the surrogate-doubled length crosses the
    // autojunk threshold that the code-point length does not)
    val cases = Seq(
      ("𠮷野家", "吉野家", 0.6666666666666666),
      ("𠮷𠮷𠮷abc", "abc", 0.6666666666666666),
      ("第1章 𠮷野家", "第1章 吉野家", 0.8571428571428571),
      ("a🎉b🎉c", "a🎉c", 0.75),
      ("𩸽" * 10 + "x", "𩸽" * 10 + "y", 0.9090909090909091),
      ("x" + "𠮷" * 120, "y" + "𠮷" * 120, 0.9917355371900827))
    cases.foreach { case (a, b, exp) =>
      val got = SeqRatio.ratio(a, b)
      assert(math.abs(got - exp) < 1e-12, s"ratio: got $got expected $exp")
    }
  }

  test("non-BMP ROVER alignment+vote matches the reference (run live)") {
    // expected values from running the reference's
    // align_texts_character_level + vote_aligned_text on these inputs
    val cases = Seq(
      (Vector("yomitoku" -> "𠮷野家で𩸽を食べた",
        "paddleocr" -> "吉野家で𩸽を食へた",
        "easyocr" -> "𠮷野家て𩸽を食べた"),
        Map("yomitoku" -> 0.9, "paddleocr" -> 0.8, "easyocr" -> 0.7),
        "𠮷野家で𩸽を食べた", 2.718888888888889),
      (Vector("yomitoku" -> "𝒜𝒜test𝒜",
        "paddleocr" -> "AAtestA", "easyocr" -> "𝒜𝒜test"),
        Map("yomitoku" -> 0.4, "paddleocr" -> 0.95, "easyocr" -> 0.6),
        "𝒜𝒜testA", 1.8428571428571427))
    cases.foreach { case (texts, conf, expText, expAvg) =>
      val pos = graft.vote.Rover.alignTextsCharacterLevel(texts)
      val (text, avg) = graft.vote.Rover.voteAlignedText(pos, conf)
      assert(text == expText, s"voted '$text' expected '$expText'")
      assert(math.abs(avg - expAvg) < 1e-9)
    }
  }

  test("alignment equal-text shortcut is bit-identical to the full matcher") {
    // adversarial inputs: verbatim-equal engines (shortcut fires),
    // popular-heavy strings long enough to trip the autojunk heuristic
    // (>200 cps, one char >1% — the case where opcode FRAGMENTATION would
    // be most plausible), astral code points, and mixed equal/unequal
    // engine sets where only SOME pairs take the shortcut
    val popular = ("ab" * 150) + "xyz" + ("ab" * 40)
    val cases = Seq(
      Vector("yomitoku" -> "同じ行のテキスト", "paddleocr" -> "同じ行のテキスト",
        "easyocr" -> "同じ行のテキスト"),
      Vector("yomitoku" -> popular, "paddleocr" -> popular, "easyocr" -> popular),
      Vector("yomitoku" -> "𠮷野家で𩸽", "paddleocr" -> "𠮷野家で𩸽",
        "easyocr" -> "吉野家て𩸽"),
      Vector("yomitoku" -> popular, "paddleocr" -> popular.drop(7),
        "easyocr" -> popular))
    cases.foreach { texts =>
      val fast = graft.vote.Rover.alignTextsCharacterLevel(texts)
      val full = graft.vote.Rover.alignTextsCharacterLevel(texts, eqShortcut = false)
      assert(fast == full, s"shortcut diverged on ${texts.map(_._2.take(20))}")
    }
  }

  test("ratio + opcodes match difflib goldens (incl. autojunk case)") {
    Fixtures.resourceLines("/fixtures/seqratio.golden.tsv").foreach { line =>
      val f = line.split("\t", -1)
      val a = Fixtures.unesc(f(0)); val b = Fixtures.unesc(f(1))
      val expRatio = f(2).toDouble
      val got = SeqRatio.ratio(a, b)
      assert(math.abs(got - expRatio) < 1e-12, s"ratio($a, $b): got $got expected $expRatio")
      val expOps = if (f(3).isEmpty) Vector.empty[String] else f(3).split(";").toVector
      val gotOps = SeqRatio.opcodes(a, b).map(o => s"${o.tag},${o.i1},${o.i2},${o.j1},${o.j2}")
      assert(gotOps == expOps, s"opcodes($a, $b)")
    }
  }

  private def randStr(r: scala.util.Random, maxLen: Int): String = {
    val chars = "abc日本語。 "
    (0 until r.nextInt(maxLen + 1)).map(_ => chars(r.nextInt(chars.length))).mkString
  }

  test("ratio bounds, identity, and opcode tiling (seeded random)") {
    val r = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val a = randStr(r, 40); val b = randStr(r, 40)
      val ratio = SeqRatio.ratio(a, b)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(SeqRatio.ratio(a, a) == 1.0)
      val ops = SeqRatio.opcodes(a, b)
      var i = 0; var j = 0
      ops.foreach { o => assert(o.i1 == i && o.j1 == j); i = o.i2; j = o.j2 }
      assert(i == a.length && j == b.length)
    }
  }
}
