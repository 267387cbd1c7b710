package graft.sink

import org.apache.spark.sql.Dataset
import graft.model._
import graft.parse.PageParser
import graft.text.Py

/** book.txt / book.md consolidate sink — faithful to the reference's
  * `consolidate_rover_output` (/root/reference/src/consolidate.py:16-91):
  * combines per-page ROVER text + per-page heading metadata into
  *   - book.txt: plain text with `\n--- {page} ---\n\n` markers;
  *   - book.md: same, with lines whose stripped text matches a page
  *     heading rewritten to `\n## {stripped}\n` (consolidate.py:69-78).
  *
  * The reference consumes a physical hashdir (per-page txt files under
  * ocr_output/rover plus headings.json); this port replicates those
  * DIRECTORY semantics exactly: pages iterate in sorted
  * "name.txt"-filename order (consolidate.py:42 sorted-glob, compared by
  * CODE POINT like python str), and duplicate page names collapse
  * last-write-wins (save_rover overwrites the file; headings.json is a
  * dict).
  *
  * Scale shape: one narrow map per doc, no shuffle — same contract as
  * [[XmlBuilder]].
  */
object Consolidate {

  /** One derived ROVER page: (page identifier, merged text, headings). */
  final case class RoverPage(name: String, text: String, headings: Vector[String])

  /** pathlib.Path.stem: name = last path component after dropping empty
    * and "." components ("scans/" -> "scans", "." -> ""); the suffix is
    * stripped only when its dot is neither leading nor trailing
    * (".x" -> ".x", "a." -> "a.", "a/b.c.txt" -> "b.c") — CPython's
    * `0 < name.rfind('.') < len(name) - 1` rule. */
  def stem(path: String): String = {
    val comps = path.split("/", -1).filter(c => c.nonEmpty && c != ".")
    val name = if (comps.isEmpty) "" else comps.last
    val i = name.lastIndexOf('.')
    if (i > 0 && i < name.length - 1) name.substring(0, i) else name
  }

  /** Derive the ROVER-page inputs from a parsed document: page identifier
    * = stem(sourceFile) (falling back to "page_{number}"), text = content
    * element texts joined by "\n" (lists join their items), headings =
    * in-order raw heading texts — the live pipeline's save_rover /
    * save_headings payloads (src/rover/ensemble.py:267,
    * src/rover/output.py:49-58,90-107). */
  def roverPages(lines: IndexedSeq[String]): Vector[RoverPage] = {
    val parsed = PageParser.parseDocument(lines)
    parsed.pages.map { p =>
      val name = if (p.sourceFile.nonEmpty) stem(p.sourceFile) else s"page_${p.number}"
      val ls = Vector.newBuilder[String]
      val hs = Vector.newBuilder[String]
      p.elements.foreach {
        case h: Heading    => ls += h.text; hs += h.text
        case pa: Paragraph => ls += pa.text
        case l: ListEl     => ls += l.items.mkString("\n")
      }
      RoverPage(name, ls.result().mkString("\n"), hs.result())
    }
  }

  def roverPages(doc: InputDoc): Vector[RoverPage] =
    roverPages(doc.spans.sortBy(_.offset).map(_.text).toIndexedSeq)

  /** python str ordering = code-point lexicographic. java.lang.String
    * compares UTF-16 units, which inverts non-BMP vs U+E000..U+FFFF. */
  private val pyStringOrder: Ordering[String] = (a: String, b: String) => {
    val ca = Py.codePoints(a); val cb = Py.codePoints(b)
    var i = 0
    val n = math.min(ca.length, cb.length)
    var r = 0
    while (r == 0 && i < n) { r = Integer.compare(ca(i), cb(i)); i += 1 }
    if (r != 0) r else Integer.compare(ca.length, cb.length)
  }

  /** consolidate_rover_output (consolidate.py:16-91) -> (book.txt,
    * book.md) contents. Raises on an empty page list like the reference
    * (`No ROVER output files found`, consolidate.py:47-48). */
  def consolidate(pages: Seq[RoverPage]): (String, String) = {
    if (pages.isEmpty)
      throw new java.io.FileNotFoundException("No ROVER output files found")
    // physical-dir collapse: later saves overwrite (Map keeps the last
    // binding per key) — both the rover .txt file and the headings entry
    val files = pages.map(p => (p.name + ".txt") -> p.text).toMap
    val allHeadings = pages.map(p => p.name -> p.headings).toMap
    val txt = new StringBuilder
    val md = new StringBuilder
    files.keys.toVector.sorted(pyStringOrder).foreach { fname =>
      // page_name = Path(file).stem, NOT a blind ".txt" strip: an empty
      // page name writes the file ".txt", whose stem is ".txt" (leading
      // dot = no suffix) — the reference's marker says "--- .txt ---"
      val pageName = stem(fname)
      // read_text() universal newlines: \r\n and \r become \n on READ of
      // the rover text. headings.json escapes control chars (json \\r),
      // so HEADINGS keep their \r — translate the text only.
      val pageText = files(fname).replace("\r\n", "\n").replace('\r', '\n')
      val pageHeadings: Set[String] = allHeadings.getOrElse(pageName, Vector.empty).toSet

      txt.append("\n--- ").append(pageName).append(" ---\n\n")
      txt.append(pageText).append("\n\n")

      val mdText =
        if (pageHeadings.nonEmpty) {
          // python text.split("\n") keeps trailing empties -> split limit -1
          pageText.split("\n", -1).map { line =>
            val stripped = Py.strip(line)
            if (pageHeadings.contains(stripped)) s"\n## $stripped\n" else line
          }.mkString("\n")
        } else pageText
      md.append("\n--- ").append(pageName).append(" ---\n\n")
      md.append(mdText).append("\n\n")
    }
    (txt.toString, md.toString)
  }

  /** Distributed entry: (doc_id, book_txt, book_md, error) — one narrow
    * map. Docs the reference itself rejects (zero pages -> its
    * FileNotFoundError) are quarantined as error rows instead of killing
    * the job, like the grouped-XML sink path. */
  def books(docs: Dataset[InputDoc]): Dataset[(String, String, String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { d =>
      scala.util.Try(consolidate(roverPages(d))) match {
        case scala.util.Success((t, m)) => (d.doc_id, t, m, "")
        case scala.util.Failure(e)      => (d.doc_id, "", "", e.getClass.getSimpleName)
      }
    })
  }
}
