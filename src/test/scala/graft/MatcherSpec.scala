package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.matching.TocMatcher
import graft.matching.TocMatcher.BodyHeading
import graft.model.TocEntry
import graft.group.Sections

/** TOC<->heading matcher parity vs reference-generated goldens
  * (25 random books: 57 exact / 30 fuzzy / 14 missing), plus
  * section-assignment unit semantics. */
class MatcherSpec extends AnyFunSuite {

  test("300 random cases: section extraction == reference section.py/hierarchy.py") {
    // differential fixture from RUNNING extract_section_from_heading,
    // extract_section_from_page_metadata, parse_section_number and
    // _find_toc_key on random texts/configs (full-width digits, ascii-only
    // lstrip('0'), re.escape'd keywords incl. metachars, IGNORECASE,
    // <emphasis> veto, zero-pad lookup) — scripts/gen_sections_random.py
    def cfg(spec: String): Option[Sections.HeaderLevelConfig] = {
      if (spec.isEmpty) return None
      val byLevel = spec.split(';').map { e =>
        val Array(l, kws) = e.split(":", 2)
        l.toInt -> kws.split('|').toVector
      }.toMap
      Some(Sections.HeaderLevelConfig(
        byLevel.getOrElse(1, Vector.empty), byLevel.getOrElse(2, Vector.empty),
        byLevel.getOrElse(3, Vector.empty), byLevel.getOrElse(4, Vector.empty),
        byLevel.getOrElse(5, Vector.empty)))
    }
    var s = 0; var n = 0; var k = 0
    Fixtures.resourceLines("/fixtures/sections_random.golden.tsv")
      .filter(_.nonEmpty).foreach { row =>
        val f = row.split("\t", -1)
        val c = f(1)
        f(0) match {
          case "S" =>
            val conf = cfg(Fixtures.unesc(f(2)))
            val text = Fixtures.unesc(f(3))
            val h = Sections.extractSectionFromText(text, conf)
            val m = Sections.extractSectionFromMetadata(text, conf)
            assert(h == (if (f(4) == "1") Some(Fixtures.unesc(f(5))) else None),
              s"case $c heading: got $h for '$text' cfg=${f(2)}")
            assert(m == (if (f(6) == "1") Some(Fixtures.unesc(f(7))) else None),
              s"case $c metadata: got $m for '$text' cfg=${f(2)}")
            s += 1
          case "N" =>
            val parsed = Sections.parseSectionNumber(Fixtures.unesc(f(2)))
            if (f(3) == "0") assert(parsed.isEmpty, s"case $c: parsed '${f(2)}'")
            else {
              assert(parsed.nonEmpty, s"case $c: failed to parse '${f(2)}'")
              val p = parsed.get
              assert(p.raw == Fixtures.unesc(f(4)) &&
                p.parts.mkString(",") == f(5) && p.level == f(6).toInt,
                s"case $c parse: got $p exp ${f.toVector}")
            }
            n += 1
          case "K" =>
            val keys = if (f(3).isEmpty) Set.empty[String] else f(3).split(',').toSet
            val got = Sections.findTocKey(f(2), keys)
            assert(got == (if (f(4) == "1") Some(f(5)) else None),
              s"case $c findTocKey(${f(2)}, $keys): got $got")
            k += 1
        }
      }
    assert(s == 300 && n == 300 && k == 300)
  }

  test("250 random cases: matchTocToBody == reference match_toc_to_body") {
    // differential fixture from RUNNING heading_matcher.py on seeded
    // random (toc, headings) sets: number-prefixed/fuzzy/missing/noise
    // headings, zero-padded + dotted + empty numbers, broken
    // monotonicity (sequential-cursor edge), thresholds 0.8/0.6 —
    // scripts/gen_matcher_random.py
    var curCase = -1
    var threshold = 0.8
    var toc = Vector.empty[TocEntry]
    var hs = Vector.empty[BodyHeading]
    var expected = Vector.empty[(String, String, String, Double, Int)]
    var checked = 0
    def flush(): Unit = if (curCase >= 0) {
      val res = TocMatcher.matchTocToBody(toc, hs, threshold)
      assert(res.length == expected.length, s"case $curCase result count")
      res.zip(expected).zipWithIndex.foreach {
        case ((m, (num, text, mt, sim, line)), i) =>
          assert(m.tocEntry.number == num && m.tocEntry.text == text, s"case $curCase[$i] entry")
          assert(m.matchType.toString.toLowerCase == mt, s"case $curCase[$i] type: " +
            s"got ${m.matchType} exp $mt")
          assert(math.abs(m.similarity - sim) < 1e-12,
            s"case $curCase[$i] sim: got ${m.similarity} exp $sim")
          assert(m.lineNumber == line, s"case $curCase[$i] line: got ${m.lineNumber} exp $line")
      }
      checked += 1
    }
    Fixtures.resourceLines("/fixtures/matcher_random.golden.tsv")
      .filter(_.nonEmpty).foreach { lineStr =>
        val f = lineStr.split("\t", -1)
        f(0) match {
          case "T" =>
            flush()
            curCase = f(1).toInt
            threshold = f(2).toDouble
            toc = f.drop(3).grouped(4).filter(_.length == 4).map(g =>
              TocEntry(Fixtures.unesc(g(0)), g(1).toInt, Fixtures.unesc(g(2)), g(3))).toVector
            hs = Vector.empty
            expected = Vector.empty
          case "H" =>
            hs :+= BodyHeading(Fixtures.unesc(f(2)), f(3).toInt, f(4).toInt)
          case "R" =>
            expected :+= ((Fixtures.unesc(f(2)), Fixtures.unesc(f(3)), f(4),
              f(5).toDouble, f(6).toInt))
        }
      }
    flush()
    assert(checked == 250)
  }

  test("match_toc_to_body matches reference goldens") {
    case class Case(toc: Vector[TocEntry], headings: Vector[BodyHeading])
    val cases = scala.collection.mutable.Map.empty[Int, (Vector[TocEntry], Vector[BodyHeading])]
    Fixtures.resourceLines("/fixtures/matcher.cases.tsv").foreach { line =>
      val f = line.split("\t", -1)
      val id = f(0).toInt
      val (toc, hs) = cases.getOrElse(id, (Vector.empty, Vector.empty))
      if (f(1) == "T")
        cases(id) = (toc :+ TocEntry(Fixtures.unesc(f(2)), f(3).toInt, f(4), f(5)), hs)
      else
        cases(id) = (toc, hs :+ BodyHeading(Fixtures.unesc(f(2)), f(3).toInt, f(6).toInt))
    }
    val expected = Fixtures.resourceLines("/fixtures/matcher.expected.tsv")
      .map(_.split("\t", -1))
      .groupBy(_(0).toInt)
    expected.toSeq.sortBy(_._1).foreach { case (caseId, rows) =>
      val (toc, headings) = cases(caseId)
      val results = TocMatcher.matchTocToBody(toc, headings)
      assert(results.size == rows.size, s"case $caseId result count")
      rows.sortBy(_(1).toInt).zip(results).foreach { case (exp, got) =>
        val expType = exp(2)
        val gotType = got.matchType match {
          case TocMatcher.Exact => "exact"; case TocMatcher.Fuzzy => "fuzzy"
          case TocMatcher.Missing => "missing"
        }
        assert(gotType == expType, s"case $caseId toc#${exp(1)} type")
        assert(got.bodyHeading.map(_.text).getOrElse("") == Fixtures.unesc(exp(3)),
          s"case $caseId toc#${exp(1)} heading")
        assert(math.abs(got.similarity - exp(4).toDouble) < 1e-9, s"case $caseId toc#${exp(1)} sim")
        assert(got.lineNumber == exp(5).toInt, s"case $caseId toc#${exp(1)} line")
      }
    }
  }

  test("section number parsing: trailing zeros (page_grouper/models.py:36-59)") {
    val sn = Sections.parseSectionNumber("1.0.0").get
    assert(sn.isChapter && sn.effectiveParts == Vector(1))
    assert(Sections.parseSectionNumber("1.1.0").get.isSection)
    assert(Sections.parseSectionNumber("2.1.3").get.isSubsection)
    assert(Sections.parseSectionNumber("abc").isEmpty)
    assert(Sections.parseSectionNumber("").isEmpty)
  }

  test("toc key zero-pad fallback (hierarchy.py:22-44)") {
    val keys = Set("1.0", "2.0.0", "3.1")
    assert(Sections.findTocKey("1", keys).contains("1.0"))
    assert(Sections.findTocKey("2", keys).contains("2.0.0"))
    assert(Sections.findTocKey("3.1", keys).contains("3.1"))
    assert(Sections.findTocKey("4", keys).isEmpty)
  }

  test("section extraction from heading/metadata (section.py:106-196)") {
    assert(Sections.extractSectionFromHeading("Chapter 2 Title").contains("2"))
    assert(Sections.extractSectionFromHeading("Section 1.1 概要").contains("1.1"))
    assert(Sections.extractSectionFromHeading("Subsection 1.1.2 詳細").contains("1.1.2"))
    assert(Sections.extractSectionFromText("1.1 タイトル").contains("1.1"))
    assert(Sections.extractSectionFromText("第3章 まとめ").contains("3"))
    assert(Sections.extractSectionFromText("1 / 3").isEmpty) // page-number format guarded
    assert(Sections.extractSectionFromText("本文テキスト").isEmpty)
  }

  test("page->section forward fill (assignment.py:138-174)") {
    val keys = Set("1", "1.1", "2")
    val assigned = Sections.assignPagesToSections(
      Vector(None, Some("1"), None, Some("1.1"), Some("9.9"), Some("2"), None), keys)
    assert(assigned == Vector(Some("1"), Some("1"), Some("1"), Some("1.1"), Some("1.1"),
      Some("2"), Some("2")))
  }

  test("duplicate heading detection (transformer_utils.py:46-77)") {
    assert(Sections.isDuplicateHeading("Chapter 1 「企画」で失敗", Some("1"), "「企画」で失敗"))
    assert(!Sections.isDuplicateHeading("すべての要求に応えてしまう", Some("1.1"), "なんでもできる"))
    assert(Sections.isDuplicateHeading("Section 2.1 監視", Some("2.1"), "監視"))
  }

  test("heading level from number (normalization_rules.py:16-28)") {
    assert(Sections.headingLevelFromNumber("1.0.0") == 1)
    assert(Sections.headingLevelFromNumber("1.1.0") == 2)
    assert(Sections.headingLevelFromNumber("1.1.1") == 3)
    assert(Sections.headingLevelFromNumber("") == 2)
  }

  test("find_similar_candidate matches reference goldens") {
    Fixtures.resourceLines("/fixtures/simcand.golden.tsv").foreach { line =>
      val f = line.split("\t", -1)
      val toc = TocEntry(Fixtures.unesc(f(1)), 1, "", "")
      val headings = Fixtures.unesc(f(2)).split("\u0001", -1).toVector.zipWithIndex
        .map { case (t, i) => BodyHeading(t, 2, i + 1) }
      val got = TocMatcher.findSimilarCandidate(toc, headings)
      if (f(3).isEmpty) assert(got.isEmpty, s"case ${f(0)}")
      else {
        assert(got.map(_._1.text).contains(Fixtures.unesc(f(3))), s"case ${f(0)} heading")
        assert(math.abs(got.get._2 - f(4).toDouble) < 1e-9, s"case ${f(0)} sim")
      }
    }
  }

  test("dedup primitives: shingles/ngrams/simhash determinism") {
    assert(graft.ops.Dedup.simhash64(Seq("a", "b")) == graft.ops.Dedup.simhash64(Seq("a", "b")))
    assert(graft.ops.Dedup.simhash64(Seq("a", "b")) != graft.ops.Dedup.simhash64(Seq("a", "c")))
    assert(java.lang.Long.bitCount(
      graft.ops.Dedup.simhash64(Seq("the", "quick", "fox")) ^
        graft.ops.Dedup.simhash64(Seq("the", "quick", "dog"))) <= 32)
  }
}
