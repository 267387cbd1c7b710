package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.SeqRatio

/** Parity with CPython difflib.SequenceMatcher (goldens generated from
  * the stdlib), plus algebraic properties on seeded random strings. */
class SeqRatioSpec extends AnyFunSuite {

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
