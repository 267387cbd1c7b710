package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Heading, Paragraph, Region}
import graft.analyze.Headings
import graft.layout.ReadingOrder
import graft.parse.{Markers, Paragraphs, TocParse}
import graft.pipeline.PhashDedup
import graft.text.Normalize

class TextSpec extends AnyFunSuite {

  test("300 random texts: display width == reference _display_width") {
    // differential fixture from RUNNING unicodedata-based _display_width
    // (scripts/gen_width_random.py) — incl. the AMBIGUOUS east-asian
    // class (±, §, Greek/Cyrillic, circled digits) = 2 columns
    var checked = 0
    Fixtures.resourceLines("/fixtures/width_random.golden.tsv")
      .filter(_.nonEmpty).foreach { row =>
        val f = row.split("\t", -1)
        val t = Fixtures.unesc(f(2))
        assert(graft.parse.Stats.displayWidth(t) == f(3).toInt,
          s"case ${f(1)} width('$t'): got ${graft.parse.Stats.displayWidth(t)} exp ${f(3)}")
        checked += 1
      }
    assert(checked == 300)
  }

  test("250 random region sets: reading order + overlap removal == reference") {
    // differential fixture from RUNNING sort_reading_order +
    // remove_overlaps (scripts/gen_layout_random.py): strict mid_x column
    // split, (y, TYPE_PRIORITY, x) ties, unknown types, same-type IoU>=0.5
    // suppression with confidence ties
    var width = 0
    var regions = Vector.empty[Region]
    var expO = Vector.empty[Int]
    var expD = Vector.empty[Int]
    var curCase = -1
    var checked = 0
    def flush(): Unit = if (curCase >= 0) {
      val gotO = ReadingOrder.sortReadingOrder(regions, width)
      assert(gotO == expO.map(regions), s"case $curCase sort:\n got $gotO\n exp ${expO.map(regions)}")
      val gotD = ReadingOrder.removeOverlaps(regions)
      assert(gotD == expD.map(regions), s"case $curCase overlaps:\n got $gotD\n exp ${expD.map(regions)}")
      checked += 1
    }
    Fixtures.resourceLines("/fixtures/layout_random.golden.tsv")
      .filter(_.nonEmpty).foreach { row =>
        val f = row.split("\t", -1)
        f(0) match {
          case "G" =>
            flush()
            curCase = f(1).toInt; width = f(2).toInt
            regions = Vector.empty; expO = Vector.empty; expD = Vector.empty
          case "I" => regions :+=
            Region(f(2), f(3).toInt, f(4).toInt, f(5).toInt, f(6).toInt, f(7).toDouble)
          case "O" => expO :+= f(2).toInt
          case "D" => expD :+= f(2).toInt
        }
      }
    flush()
    assert(checked == 250)
  }

  test("400 random texts: heading normalization == reference heading_normalizer.py") {
    // differential fixture from RUNNING normalize_number_format,
    // normalize_spaces and is_special_marker (full-width + Arabic-Indic
    // Nd digits, separator joins vs text hyphens, iterative space
    // collapsing) — scripts/gen_normalize_random.py; gates the
    // numberPattern Unicode-Nd fix
    var checked = 0
    Fixtures.resourceLines("/fixtures/normalize_random.golden.tsv")
      .filter(_.nonEmpty).foreach { row =>
        val f = row.split("\t", -1)
        val c = f(1)
        val in = Fixtures.unesc(f(2))
        assert(Normalize.numberFormat(in) == Fixtures.unesc(f(3)),
          s"case $c numberFormat('$in'): got ${Normalize.numberFormat(in)}")
        assert(Normalize.spaces(in) == Fixtures.unesc(f(4)),
          s"case $c spaces('$in'): got ${Normalize.spaces(in)}")
        assert(Normalize.isSpecialMarker(in) == (f(5) == "1"),
          s"case $c isSpecialMarker('$in')")
        checked += 1
      }
    assert(checked == 400)
  }

  test("300 random blocks: paragraph assembly == reference paragraph.py") {
    // differential fixture from RUNNING parse_paragraph,
    // parse_paragraph_lines, split_paragraphs and
    // merge_continuation_paragraphs — scripts/gen_paragraphs_random.py
    var block = Vector.empty[String]
    var expS = Vector.empty[(String, Boolean)]
    var expM = Vector.empty[(String, Boolean)]
    var curCase = -1
    var checked = 0
    def flushSM(): Unit = if (curCase >= 0) {
      val splits = Paragraphs.splitParagraphs(block.mkString("\n"))
      assert(splits.map(p => (p.text, p.readAloud)) == expS,
        s"case $curCase split:\n got ${splits.map(_.text)}\n exp ${expS.map(_._1)}")
      val merged = Paragraphs.mergeContinuation(splits)
      assert(merged.map(p => (p.text, p.readAloud)) == expM,
        s"case $curCase merge:\n got ${merged.map(_.text)}\n exp ${expM.map(_._1)}")
      checked += 1
    }
    def opt(f: Array[String]): Option[(String, Boolean)] =
      if (f(2) == "1") Some((Fixtures.unesc(f(3)), f(4) == "1")) else None
    Fixtures.resourceLines("/fixtures/paragraphs_random.golden.tsv")
      .filter(_.nonEmpty).foreach { row =>
        val f = row.split("\t", -1)
        f(0) match {
          case "B" =>
            if (f(1).toInt != curCase) {
              flushSM()
              curCase = f(1).toInt
              block = Vector.empty; expS = Vector.empty; expM = Vector.empty
            }
            block :+= Fixtures.unesc(f(2))
          case "P" =>
            val got = Paragraphs.parseParagraph(block).map(p => (p.text, p.readAloud))
            assert(got == opt(f), s"case $curCase parseParagraph: got $got")
          case "L" =>
            val got = Paragraphs.parseParagraphLines(block).map(p => (p.text, p.readAloud))
            assert(got == opt(f), s"case $curCase parseParagraphLines: got $got")
          case "S" => expS :+= ((Fixtures.unesc(f(3)), f(4) == "1"))
          case "M" => expM :+= ((Fixtures.unesc(f(3)), f(4) == "1"))
        }
      }
    flushSM()
    assert(checked == 300)
  }

  test("300 random lines: toc/content/heading/list/figure recognizers == reference") {
    // differential fixture from RUNNING parse_toc_marker,
    // parse_content_marker, parse_heading_with_warning, is_list_line,
    // parse_figure_comment, parse_figure_placeholder and parse_toc_lines
    // on random lines / toc blocks — scripts/gen_lines_random.py
    def mv(m: Option[Markers.Marker]): String = m.map {
      case Markers.TocStart     => "toc_start"
      case Markers.TocEnd       => "toc_end"
      case Markers.ContentStart => "content_start"
      case Markers.ContentEnd   => "content_end"
      case Markers.SkipStart    => "skip_start"
      case Markers.SkipEnd      => "skip_end"
    }.getOrElse("")
    var input = ""
    var block = Vector.empty[String]
    var expEntries = Vector.empty[(String, Int, String, String)]
    var curCase = -1
    var checked = 0
    def flushToc(): Unit = if (curCase >= 0) {
      val got = TocParse.parseTocLines(block)
        .map(e => (e.text, e.level, e.number, e.page))
      assert(got == expEntries,
        s"case $curCase toc block ${block.mkString("|")}:\n got $got\n exp $expEntries")
      checked += 1
    }
    Fixtures.resourceLines("/fixtures/lines_random.golden.tsv")
      .filter(_.nonEmpty).foreach { row =>
        val f = row.split("\t", -1)
        f(0) match {
          case "L" =>
            flushToc()
            curCase = f(1).toInt
            input = Fixtures.unesc(f(2))
            block = Vector.empty
            expEntries = Vector.empty
          case "R" =>
            val c = f(1)
            assert(mv(Markers.parseTocMarker(input)) == f(2), s"case $c toc marker '$input'")
            assert(mv(Markers.parseContentMarker(input)) == f(3), s"case $c content marker '$input'")
            val (h, warn) = Markers.parseHeadingWithWarning(input)
            if (f(4) == "0") assert(h.isEmpty, s"case $c: unexpected heading for '$input'")
            else {
              assert(h.nonEmpty && h.get.level == f(5).toInt &&
                h.get.text == Fixtures.unesc(f(6)), s"case $c heading: got $h for '$input'")
            }
            assert(warn == (if (f(7) == "1") Some(Fixtures.unesc(f(8))) else None),
              s"case $c warning for '$input'")
            val (isL, lType, lContent) = Markers.isListLine(input)
            assert((isL, lType, lContent) ==
              ((f(9) == "1", f(10), Fixtures.unesc(f(11)))), s"case $c list for '$input'")
            assert(Markers.parseFigureComment(input) ==
              (if (f(12) == "1") Some(Fixtures.unesc(f(13))) else None), s"case $c figc '$input'")
            assert(Markers.parseFigurePlaceholder(input) ==
              (if (f(14) == "1") Some(Fixtures.unesc(f(15))) else None), s"case $c figp '$input'")
          case "T" => block :+= Fixtures.unesc(f(2))
          case "E" => expEntries :+=
            ((Fixtures.unesc(f(2)), f(3).toInt, Fixtures.unesc(f(4)), Fixtures.unesc(f(5))))
        }
      }
    flushToc()
    assert(checked == 300)
  }

  test("200 random heading sets: analyzer pipeline == reference") {
    // differential fixture from RUNNING analyze_headings +
    // detect_running_head + apply_read_aloud_rules (scripts/
    // gen_headings_random.py): dash-variant normalization merges,
    // level tie-breaks, running-head thresholds, all static exclusion
    // patterns
    val lines = Fixtures.resourceLines("/fixtures/headings_random.golden.tsv")
    var nPages = 0
    var threshold = 0.5
    var hs = Vector.empty[Heading]
    var expP = Vector.empty[(String, Int, Boolean)]
    var expY = Map.empty[String, (Int, Int, String, Boolean)]
    var curCase = -1
    var checked = 0
    def flush(): Unit = if (curCase >= 0) {
      val analyses = Headings.detectRunningHead(Headings.analyze(hs), nPages, threshold)
      val gotY = analyses.map(a =>
        a.text -> ((a.level, a.count, a.levels.mkString(","), a.isRunningHead))).toMap
      assert(gotY == expY, s"case $curCase analyses:\n got $gotY\n exp $expY")
      val processed = Headings.applyReadAloudRules(hs, analyses)
      val gotP = processed.map(h => (h.text, h.level, h.readAloud))
      assert(gotP == expP, s"case $curCase processed:\n got $gotP\n exp $expP")
      checked += 1
    }
    lines.filter(_.nonEmpty).foreach { row =>
      val f = row.split("\t", -1)
      f(0) match {
        case "A" =>
          flush()
          curCase = f(1).toInt; nPages = f(2).toInt; threshold = f(3).toDouble
          hs = Vector.empty; expP = Vector.empty; expY = Map.empty
        case "H" => hs :+= Heading(f(2).toInt, Fixtures.unesc(f(3)))
        case "P" => expP :+= ((Fixtures.unesc(f(3)), f(4).toInt, f(5) == "1"))
        case "Y" => expY += Fixtures.unesc(f(2)) ->
          ((f(3).toInt, f(4).toInt, f(5), f(6) == "1"))
      }
    }
    flush()
    assert(checked == 200)
  }

  test("400 random lines: page-marker recognizers == reference") {
    // differential fixture from RUNNING extract_page_number +
    // parse_page_metadata on adversarial marker-ish lines (full-width /
    // zero-padded / mixed-width digits, exotic whitespace, broken
    // markers) — scripts/gen_markers_random.py
    val lines = Fixtures.resourceLines("/fixtures/markers_random.golden.tsv")
    var input = ""
    var checked = 0
    lines.filter(_.nonEmpty).foreach { row =>
      val f = row.split("\t", -1)
      f(0) match {
        case "L" => input = Fixtures.unesc(f(2))
        case "R" =>
          val c = f(1)
          val (num, src) = Markers.extractPageNumber(input)
          assert(num == Fixtures.unesc(f(2)), s"case $c number: got '$num' for '$input'")
          assert(src == Fixtures.unesc(f(3)), s"case $c source: got '$src' for '$input'")
          val meta = Markers.parsePageMetadata(graft.text.Py.strip(input))
          if (f(4) == "0") assert(meta.isEmpty, s"case $c: unexpected metadata for '$input'")
          else {
            assert(meta.nonEmpty, s"case $c: missing metadata for '$input'")
            val m = meta.get
            assert(m.text == Fixtures.unesc(f(5)), s"case $c meta text")
            assert(m.metaType == f(6), s"case $c meta type")
            assert(m.sectionName == Fixtures.unesc(f(7)), s"case $c section")
            assert(m.current == f(8).toInt && m.total == f(9).toInt, s"case $c N/M")
          }
          checked += 1
      }
    }
    assert(checked == 400)
  }

  test("dash normalization folds all 7 variants (analyzer.py:16-38)") {
    assert(Normalize.dashes("a—b–c―d‐e−fーg－h") == "a-b-c-d-e-f-g-h")
  }

  test("number format: full-width + separators (heading_normalizer.py:47-91)") {
    assert(Normalize.numberFormat("１．１ 概要") == "1.1 概要")
    assert(Normalize.numberFormat("1-1-1 タイトル") == "1.1.1 タイトル")
    assert(Normalize.numberFormat("1・2 タイトル") == "1.2 タイトル")
    assert(Normalize.numberFormat("SRE-based approach") == "SRE-based approach")
  }

  test("space normalization to fixpoint (heading_normalizer.py:94-125)") {
    assert(Normalize.spaces("第 1 章 はじめに") == "第1章 はじめに")
    assert(Normalize.spaces("1. 2. 3 タイトル") == "1.2.3 タイトル")
  }

  test("special marker detection") {
    assert(Normalize.isSpecialMarker("■ 項目"))
    assert(Normalize.isSpecialMarker("  ◆ x"))
    assert(!Normalize.isSpecialMarker("項目 ■"))
  }

  test("page markers: all 4 formats (page.py:38-116)") {
    assert(Markers.extractPageNumber("--- Page 1 (page_0001.png) ---") == ("1", "page_0001.png"))
    assert(Markers.extractPageNumber("--- page_0012 ---") == ("12", "page_0012"))
    assert(Markers.extractPageNumber("--- Page (scan.png) ---") == ("", "scan.png"))
    assert(Markers.extractPageNumber("--- Page: page_0003.png ---") == ("3", "page_0003.png"))
    assert(Markers.extractPageNumber("通常の行") == ("", ""))
  }

  test("page metadata: chapter vs section (page.py:134-176)") {
    val m = Markers.parsePageMetadata("はじめに 1 / 3").get
    assert(m.metaType == "chapter-page" && m.sectionName == "はじめに" && m.current == 1 && m.total == 3)
    assert(Markers.parsePageMetadata("第1節 5 / 10").get.metaType == "section-page")
    assert(Markers.parsePageMetadata("本文です").isEmpty)
  }

  test("list detection: bullets and ordered (utils.py:15-74)") {
    assert(Markers.isListLine("- item") == ((true, "unordered", "item")))
    assert(Markers.isListLine("・ 項目") == ((true, "unordered", "項目")))
    assert(Markers.isListLine("1. 手順") == ((true, "ordered", "手順")))
    assert(Markers.isListLine("① 丸数字") == ((true, "ordered", "丸数字")))
    assert(Markers.isListLine("（2） 括弧") == ((true, "ordered", "括弧")))
    assert(Markers.isListLine("-") == ((false, "", ""))) // no content
    assert(Markers.isListLine("本文です") == ((false, "", "")))
  }

  test("figure parsing: comment + bold caption (figure.py:49-167)") {
    assert(Markers.parseFigureComment("<!-- FIGURE: figs/a.png -->").contains("figs/a.png"))
    assert(Markers.parseFigureComment("<!-- figure: b.jpg -->").contains("b.jpg"))
    val fig = Markers.parseFigure(Vector("<!-- FIGURE: x.png -->", "**キャプション**", "説明文。")).get
    assert(fig.path == "x.png" && fig.caption == "キャプション")
  }

  test("paragraph continuation merge incl. chain quirk (paragraph.py:97-159)") {
    val ps = Vector(Paragraph("これは継続"), Paragraph("まだ継続"), Paragraph("段落です。"), Paragraph("次。"))
    assert(Paragraphs.mergeContinuation(ps).map(_.text) ==
      Vector("これは継続まだ継続段落です。", "次。"))
    // terminators: ！ ? 。 . and 」。/）。
    assert(Paragraphs.mergeContinuation(Vector(Paragraph("終わり！"), Paragraph("次です。")))
      .map(_.text) == Vector("終わり！", "次です。"))
    // last paragraph kept even unterminated
    assert(Paragraphs.mergeContinuation(Vector(Paragraph("a。"), Paragraph("未完")))
      .map(_.text) == Vector("a。", "未完"))
  }

  test("toc entry parse: leaders and levels (toc.py:327-482)") {
    assert(TocParse.parseTocEntry("2.1 SLOの理解 ─── 30").get ==
      graft.model.TocEntry("SLOの理解", 2, "2.1", "30"))
    assert(TocParse.parseTocEntry("Chapter 3 Advanced .... 42").get ==
      graft.model.TocEntry("Advanced", 1, "3", "42"))
    assert(TocParse.parseTocEntry("1.2.3.4.5 深い項目 12").get.level == 5)
    assert(TocParse.parseTocEntry("はじめに .... 3").get ==
      graft.model.TocEntry("はじめに", 1, "", "3"))
    assert(TocParse.parseTocEntry("4 「進捗管理」で失敗").get ==
      graft.model.TocEntry("「進捗管理」で失敗", 1, "4", ""))
  }

  test("toc multiline merge (toc.py:108-209)") {
    assert(TocParse.mergeTocLines(Vector("Chapter", "1 Title")) == Vector("Chapter 1 Title"))
    assert(TocParse.mergeTocLines(Vector("Episode 01", "Title")) == Vector("Episode 01 Title"))
    assert(TocParse.mergeTocLines(Vector("Column", "", "Title")) == Vector("Column Title"))
    assert(TocParse.mergeTocLines(Vector("Chapter", "Title no digit")) ==
      Vector("Chapter", "Title no digit"))
  }

  test("heading analysis: most frequent level, ties -> smaller (analyzer.py:41-99)") {
    val hs = Vector(Heading(2, "柱"), Heading(1, "柱"), Heading(1, "柱"), Heading(3, "他"))
    val a = Headings.analyze(hs)
    assert(a.map(x => (x.text, x.level, x.count)) == Vector(("柱", 1, 3), ("他", 3, 1)))
    // tie between levels 2 and 1 -> smaller level wins
    val tie = Headings.analyze(Vector(Heading(2, "t"), Heading(1, "t")))
    assert(tie.head.level == 1)
  }

  test("running head threshold max(pages*0.5, 2) (analyzer.py:102-151)") {
    val a = Headings.analyze(Vector.fill(2)(Heading(1, "柱テキスト")))
    assert(Headings.detectRunningHead(a, 3).head.isRunningHead) // 2 >= max(1.5, 2)
    val b = Headings.analyze(Vector(Heading(1, "一度だけ")))
    assert(!Headings.detectRunningHead(b, 2).head.isRunningHead) // 1 < 2
  }

  test("exclusion patterns (config.py:12-61)") {
    assert(Headings.matchExclusionPattern("タイトル — 3 / 10").contains("page-number"))
    assert(Headings.matchExclusionPattern("◆◆◆").contains("decoration"))
    assert(Headings.matchExclusionPattern("Section 2.1").contains("section-label"))
    assert(Headings.matchExclusionPattern("Webサイト").contains("reference"))
    assert(Headings.matchExclusionPattern("注1.2 補足").contains("footnote"))
    assert(Headings.matchExclusionPattern("普通の見出し").isEmpty)
  }

  test("reading order: L/R column cut + (y, priority, x) (reading_order.py:10-65)") {
    val rs = Vector(
      Region("TEXT", 600, 100, 700, 120, 0.9), // right col
      Region("TEXT", 0, 100, 100, 120, 0.9), // left col, same y as title
      Region("TITLE", 0, 100, 200, 130, 0.9), // left col, priority 0
      Region("TEXT", 0, 300, 100, 320, 0.9)
    )
    val sorted = ReadingOrder.sortReadingOrder(rs, 1000)
    assert(sorted.map(r => (r.kind, r.x1, r.y1)) == Vector(
      ("TITLE", 0, 100), ("TEXT", 0, 100), ("TEXT", 0, 300), ("TEXT", 600, 100)))
  }

  test("overlap removal: min-area IoU >= 0.5, same type, lower conf dropped") {
    val rs = Vector(
      Region("TEXT", 0, 0, 100, 100, 0.8),
      Region("TEXT", 10, 10, 90, 90, 0.9), // contained -> IoU 1.0, higher conf wins
      Region("FIGURE", 0, 0, 100, 100, 0.1) // different type, kept
    )
    val kept = ReadingOrder.removeOverlaps(rs)
    assert(kept.map(_.confidence) == Vector(0.9, 0.1))
  }

  test("phash dedup: distance vs last KEPT, renumbered (deduplicate.py:45-62)") {
    // frames: A, A' (close to A), B (far), B' (close to B but far from A)
    val a = 0xffff000000000000L
    val a2 = a ^ 0x7L // distance 3 < 8 -> dropped
    val b = 0x0000ffff00000000L
    val b2 = b ^ 0x1fL // distance 5 from b -> dropped
    val kept = PhashDedup.dedupe(Vector((1, a), (2, a2), (3, b), (4, b2)))
    assert(kept == Vector((1, 1, a), (3, 2, b)))
    // idempotence
    val again = PhashDedup.dedupe(kept.map { case (_, n, h) => (n, h) })
    assert(again.map(_._3) == kept.map(_._3))
  }

  test("marker stats (parser/utils.py:105-136)") {
    val lines = Vector("<!-- toc -->", "x", "<!-- /toc -->", "<!-- content -->",
      "<!-- skip -->", "<!-- skip -->", "<!-- /skip -->")
    val st = graft.parse.Stats.countMarkers(lines)
    assert(st == graft.parse.Stats.MarkerStats(1, 1, 2))
  }

  test("CJK display width (cli/normalize_headings.py:17-51)") {
    assert(graft.parse.Stats.displayWidth("abc") == 3)
    assert(graft.parse.Stats.displayWidth("日本語") == 6)
    assert(graft.parse.Stats.displayWidth("aあb") == 4)
  }
}
