package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.Consolidate
import graft.sink.Consolidate.RoverPage

/** book.txt / book.md consolidate parity: byte-equality against output
  * produced by RUNNING the reference's consolidate_rover_output
  * (src/consolidate.py:16-91) on the same derived ROVER inputs — covers
  * the page-marker format, sorted-filename iteration, headings ->
  * `\n## x\n` rewriting, split/join newline semantics, and the
  * physical-dir quirks (last-write-wins duplicates). Offline campaigns
  * (MdSweep): 200 generator + 60 fuzz + 100 disjoint-id + 120 variant
  * books, all zero-diff. */
class ConsolidateSpec extends AnyFunSuite {

  private def check(md: String, prefix: String, id: String): Unit = {
    val doc = Fixtures.mdToDoc(md, id)
    val (txt, mdOut) = Consolidate.consolidate(Consolidate.roverPages(doc))
    for ((got, which) <- Seq((txt, ".book.txt"), (mdOut, ".book.md"))) {
      val expected = Fixtures.resourceString(prefix + which)
      if (got != expected) {
        val i = got.zip(expected).indexWhere { case (a, b) => a != b }
        val at = if (i < 0) math.min(got.length, expected.length) else i
        fail(s"$id$which first diff at char $at:\n" +
          s"  got      …${got.slice(at - 40, at + 60)}…\n" +
          s"  expected …${expected.slice(at - 40, at + 60)}…")
      }
    }
  }

  test("sample_book book.txt/book.md byte-equal to reference")(
    check("/fixtures/sample_book.md", "/fixtures/sample_book", "sample_book"))

  test("toc_book book.txt/book.md byte-equal to reference")(
    check("/fixtures/toc_book.md", "/fixtures/toc_book", "toc_book"))

  test("emphasis_book book.txt/book.md byte-equal to reference")(
    check("/fixtures/emphasis_book.md", "/fixtures/emphasis_book", "emphasis_book"))

  test("fullwidth_book book.txt/book.md byte-equal to reference")(
    check("/fixtures/fullwidth_book.md", "/fixtures/fullwidth_book", "fullwidth_book"))

  test("episode_book book.txt/book.md byte-equal to reference")(
    check("/fixtures/episode_book.md", "/fixtures/episode_book", "episode_book"))

  (0 until 3).foreach { i =>
    test(s"synth doc_$i book.txt/book.md byte-equal to reference")(
      check(s"/fixtures/synth/doc_$i.md", s"/fixtures/synth/doc_$i", s"doc_$i"))
  }

  test("stem matches pathlib.Path.stem") {
    assert(Consolidate.stem("page_0001.png") == "page_0001")
    assert(Consolidate.stem("figures/page_01_fig.png") == "page_01_fig")
    assert(Consolidate.stem("a.b.c") == "a.b")
    assert(Consolidate.stem("noext") == "noext")
    assert(Consolidate.stem(".hidden") == ".hidden")
    // edge cases verified against sandbox python3 pathlib:
    assert(Consolidate.stem("scans/") == "scans") // trailing slash dropped
    assert(Consolidate.stem(".") == "")           // "." components removed
    assert(Consolidate.stem("./x.txt") == "x")
    assert(Consolidate.stem("..") == "..")
    assert(Consolidate.stem("x/..") == "..")
    assert(Consolidate.stem("a.") == "a.")        // trailing dot = no suffix
    assert(Consolidate.stem("...") == "...")
    assert(Consolidate.stem("a//b") == "b")
  }

  test("carriage returns translate like read_text universal newlines") {
    // expected bytes captured by RUNNING consolidate_rover_output: rover
    // text round-trips through write_text/read_text, which translates
    // \r\n and \r to \n on read; "a " then strips to the matching heading
    val (txt, md) = Consolidate.consolidate(
      Vector(RoverPage("p", "a \rb\r\nc", Vector("a"))))
    assert(txt == "\n--- p ---\n\na \nb\nc\n\n")
    assert(md == "\n--- p ---\n\n\n## a\n\nb\nc\n\n")
    // headings survive the json round-trip UNtranslated (json escapes
    // control chars), so a \r heading can never match a translated line
    val (_, md2) = Consolidate.consolidate(
      Vector(RoverPage("q", "x\ry", Vector("x\ry"))))
    assert(md2 == "\n--- q ---\n\nx\ny\n\n")
  }

  test("empty page name round-trips through the filesystem as '.txt'") {
    // save_rover("") writes the file ".txt"; Path(".txt").stem == ".txt"
    // (leading dot = no suffix), so the reference's marker says .txt —
    // bytes captured from a live run
    val (txt, md) = Consolidate.consolidate(Vector(RoverPage("", "body", Vector.empty)))
    assert(txt == "\n--- .txt ---\n\nbody\n\n")
    assert(md == "\n--- .txt ---\n\nbody\n\n")
  }

  test("duplicate page names collapse last-write-wins (file overwrite)") {
    val pages = Vector(
      RoverPage("p1", "first body", Vector("first body")),
      RoverPage("p1", "second body", Vector.empty))
    val (txt, md) = Consolidate.consolidate(pages)
    assert(txt == "\n--- p1 ---\n\nsecond body\n\n")
    // the headings dict entry was ALSO overwritten (by the empty list),
    // so no ## rewrite applies
    assert(md == "\n--- p1 ---\n\nsecond body\n\n")
  }

  test("pages iterate in sorted {name}.txt order (python code points)") {
    // '!' (33) < '.' (46): "p1!.txt" sorts BEFORE "p1.txt" even though
    // the bare stems sort the other way — glob sorts FILENAMES
    val pages = Vector(
      RoverPage("p1", "A", Vector.empty),
      RoverPage("p1!", "B", Vector.empty))
    val (txt, _) = Consolidate.consolidate(pages)
    assert(txt.indexOf("--- p1! ---") < txt.indexOf("--- p1 ---"))
    // non-BMP vs U+FFFD: python compares code points (0x1F600 > 0xFFFD);
    // naive UTF-16 ordering would invert this
    val pages2 = Vector(
      RoverPage("p�", "A", Vector.empty),
      RoverPage("p😀", "B", Vector.empty)) // p😀
    val (txt2, _) = Consolidate.consolidate(pages2)
    assert(txt2.indexOf("--- p� ---") < txt2.indexOf("--- p😀 ---"))
  }

  test("250 random books: byte-equal to reference consolidate_rover_output") {
    // differential fixture: seeded random (name, text, headings) books run
    // through the REFERENCE with a real hashdir round-trip (newline
    // translation, filename sorting, duplicate-name overwrite, empty-name
    // '.txt' stem all in play) — scripts/gen_consolidate_random.py
    val lines = Fixtures.resourceLines("/fixtures/consolidate_random.golden.tsv")
    val pagesByCase = collection.mutable.LinkedHashMap[Int, Vector[RoverPage]]()
    val expTxt = collection.mutable.Map[Int, String]()
    val expMd = collection.mutable.Map[Int, String]()
    lines.filter(_.nonEmpty).foreach { line =>
      val f = line.split("\t", -1)
      val c = f(1).toInt
      f(0) match {
        case "P" =>
          val page = RoverPage(Fixtures.unesc(f(2)), Fixtures.unesc(f(3)),
            f.drop(4).toVector.map(Fixtures.unesc))
          pagesByCase(c) = pagesByCase.getOrElse(c, Vector.empty) :+ page
        case "T" => expTxt(c) = Fixtures.unesc(f(2))
        case "M" => expMd(c) = Fixtures.unesc(f(2))
      }
    }
    assert(pagesByCase.size == 250)
    pagesByCase.foreach { case (c, pages) =>
      val (txt, md) = Consolidate.consolidate(pages)
      assert(txt == expTxt(c), s"case $c book.txt:\n got ${txt.take(200)}\n exp ${expTxt(c).take(200)}")
      assert(md == expMd(c), s"case $c book.md:\n got ${md.take(200)}\n exp ${expMd(c).take(200)}")
    }
  }

  test("empty page set raises like the reference FileNotFoundError") {
    intercept[java.io.FileNotFoundException](Consolidate.consolidate(Vector.empty))
  }

  test("heading rewrite matches on stripped line, preserves non-matches") {
    val pages = Vector(RoverPage("p", "  Chapter 1  \nbody text\n", Vector("Chapter 1")))
    val (txt, md) = Consolidate.consolidate(pages)
    assert(txt.contains("  Chapter 1  \nbody text\n"))
    // split("\n") -> ["  Chapter 1  ", "body text", ""] -> rewrite + rejoin
    assert(md.contains("\n## Chapter 1\n\nbody text\n"))
  }
}
