package graft.model

/** Core data model (SPEC.md §1, §8; reference abstractions SURVEY.md §1.1).
  *
  * Input shape is fixed by BASELINE.json `input_hint`:
  * `(doc_id STRING, spans ARRAY<STRUCT<kind,text,media_ref STRING, offset INT>>)`.
  */

/** One input span — distillation of the reference's per-unit records
  * (PaddleOCR line, detected region, DOM block, figure, page marker).
  */
final case class InSpan(kind: String, text: String, media_ref: String, offset: Int)

/** One input document row. */
final case class Doc(doc_id: String, spans: Seq[InSpan])

/** One output span — the reference's TextSegment (ocr_engine.py:39–52)
  * distilled to the north-rule invariant fields (kind, text, media_ref, order).
  */
final case class OutSpan(kind: String, text: String, media_ref: String, order: Int)

/** Extracted document: ordered spans + rendered markdown/html (SPEC.md §7–8)
  * + doc-level average confidence (tasks.py:365–368: mean of per-page
  * confidences, floored to per-mille — integer-exact restatement).
  */
final case class Extracted(doc_id: String, spans: Seq[OutSpan], markdown: String,
                           html: String, conf_pm: Long)

/** A parsed geometric line lifted from a `pdf_line` span payload. */
final case class Line(
    y: Int, x: Int, w: Int, h: Int,
    densityPm: Int, strokePm: Int, confPm: Int,
    raw: String, offset: Int) {
  def x2: Int = x + w
  def y2: Int = y + h
}

/** A table region lifted from a `pdf_region` span payload. `confPm` is the
  * detector confidence in per-mille (layout_analyzer.py:205: YOLO box conf).
  */
final case class Region(
    y: Int, x: Int, w: Int, h: Int,
    bordered: Boolean, confPm: Int, md: String, mediaRef: String, offset: Int) {
  def box: Box = Box(x, y, x + w, y + h)
}

/** Axis-aligned integer box (x1, y1, x2, y2). */
final case class Box(x1: Int, y1: Int, x2: Int, y2: Int) {
  def area: Long = math.max(0, x2 - x1).toLong * math.max(0, y2 - y1).toLong
  def contains(o: Box): Boolean =
    x1 <= o.x1 && y1 <= o.y1 && x2 >= o.x2 && y2 >= o.y2
}

/** A DOM block lifted from an `html_block` span payload. */
final case class HtmlBlock(depth: Int, tag: String, linkTextLen: Int, raw: String, offset: Int)

/** Figure/image span to be linked in reading order. */
final case class MediaSpan(caption: String, mediaRef: String, offset: Int)

/** Per-page parse result before document assembly. `confPm` is the page's
  * average OCR confidence in per-mille (ocr_engine.py:690–695; 0 for pages
  * with no confidence-bearing lines and for failed pages).
  */
final case class PageResult(
    pageNo: Int,
    spans: Seq[OutSpan],     // order field holds the WITHIN-PAGE index here
    markdown: String,
    html: String,
    parseFailed: Boolean,
    confPm: Int)

/** Fixed page geometry (FIXTURES.md §1: A4 @ 300 DPI, config.py:79–82). */
object Page {
  val Width: Int  = 2480
  val Height: Int = 3508
}

object Kind {
  // input kinds
  val PageBreak = "page_break"
  val PdfLine   = "pdf_line"
  val PdfRegion = "pdf_region"
  val HtmlBlock = "html_block"
  val Media     = "media"
  // output kinds (FIXTURES.md §2)
  val H1 = "h1"; val H2 = "h2"; val P = "p"
  val Table = "table"; val InvisibleTable = "invisible_table"
  val Error = "error"
}
