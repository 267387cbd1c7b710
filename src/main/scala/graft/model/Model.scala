package graft.model

/** Core data model for the extraction engine.
  *
  * Input table shape (BASELINE.json `input_hint`):
  *   doc_id:string, spans:array<struct<kind,text,media_ref,offset>>
  * Each input span is one raw markdown-surface line of the document
  * (kind is an advisory tag from the generator; the parser re-derives
  * structure from `text`, mirroring the reference's line-oriented parse
  * of book.md — /root/reference/src/book_converter/parser/page.py:270-340).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class InputDoc(doc_id: String, spans: Seq[Span])

/** Output span row. Equality invariant vs goldens is
  * (doc_id, offset, kind, text, media_ref); the attribute columns
  * (page_no, level, read_aloud, attrs) are additionally asserted in tests.
  */
final case class OutSpan(
    doc_id: String,
    offset: Int,
    kind: String,
    text: String,
    media_ref: String,
    page_no: String,
    level: Int,
    read_aloud: Boolean,
    attrs: String
)

/** Conversion error, mirrors reference ConversionError
  * (src/book_converter/models.py). */
final case class ConvError(
    error_type: String,
    message: String,
    page_number: String,
    line_number: Int
)

/** Per-document extraction result: ordered spans + errors + metrics.
  * span_count/char_count are the lineage metrics required by the north
  * rule's per-partition checkpointing. */
final case class DocResult(
    doc_id: String,
    spans: Seq[OutSpan],
    errors: Seq[ConvError],
    n_pages: Int,
    span_count: Int,
    char_count: Long
)

// ---- intermediate page model (reference src/book_converter/models.py) ----

sealed trait Element { def readAloud: Boolean }
final case class Heading(level: Int, text: String, readAloud: Boolean = true) extends Element
final case class Paragraph(text: String, readAloud: Boolean = true) extends Element
final case class ListEl(items: Vector[String], listType: String, readAloud: Boolean = true)
    extends Element

final case class Figure(path: String, caption: String, marker: String)

final case class PageMeta(
    text: String,
    metaType: String,
    sectionName: String,
    current: Int,
    total: Int
)

final case class TocEntry(text: String, level: Int, number: String, page: String)

final case class ParsedPage(
    number: String,
    sourceFile: String,
    elements: Vector[Element],
    figures: Vector[Figure],
    metadata: Option[PageMeta]
)

/** Heading frequency analysis row (reference models.py HeadingAnalysis). */
final case class HeadingAnalysis(
    text: String, // normalized
    level: Int, // most frequent level (ties -> smaller)
    count: Int,
    levels: Vector[Int],
    isRunningHead: Boolean
)

// ---- layout / OCR model (reference src/rover, src/layout) ----

/** OCR text item with bbox (reference src/rover/engines/core.py:67-79). */
final case class TextWithBox(text: String, x1: Int, y1: Int, x2: Int, y2: Int, confidence: Double) {
  def yCenter: Double = (y1 + y2) / 2.0
}

/** Layout region (reference src/layout/detector.py:69-76). */
final case class Region(kind: String, x1: Int, y1: Int, x2: Int, y2: Int, confidence: Double)
