package graft.oracle

import graft.model._
import graft.parse.{PageParser, DocParser}
import graft.corpus.CorpusGen

/** Single-threaded, reference-faithful golden generator (SURVEY.md §5.2.1).
  *
  * Implements the per-document extraction as one sequential fold — the shape
  * of the reference's in-process CLI path (batch_processor.py:421–557) — with
  * no Spark involvement. The golden-corpus comparator asserts the distributed
  * pipeline reproduces these results exactly under span-sequence equality
  * (kind, text, media_ref, order). Shares only the leaf parse kernels with the
  * pipeline (independence note: SPEC.md §9).
  */
object Oracle {

  def golden(doc: Doc): Extracted = {
    // independent sequential restatement of split + parse + assembly
    val pages = DocParser.splitPages(doc.spans)
    val results = pages.map { case (n, s) => PageParser.parse(n, s) }.sortBy(_.pageNo)
    var order = 0
    val out = Vector.newBuilder[OutSpan]
    results.foreach { r =>
      r.spans.foreach { s => out += s.copy(order = order); order += 1 }
    }
    val md = results.map(r => s"## 페이지 ${r.pageNo}\n\n${r.markdown}").mkString("\n\n---\n\n")
    val html = results.map(r =>
      s"""<div class="page-section" data-page="${r.pageNo}">\n${r.html}\n</div>""")
      .mkString("\n")
    Extracted(doc.doc_id, out.result(), md, html)
  }

  /** Golden corpus for a scale factor, lazily. */
  def goldenCorpus(spec: CorpusGen.Spec): Iterator[Extracted] =
    CorpusGen.genAll(spec).map(golden)

  /** Expected total parse failures for a spec (for metrics assertions). */
  def expectedFailures(spec: CorpusGen.Spec): Long =
    CorpusGen.genAll(spec).map { d =>
      DocParser.splitPages(d.spans).count { case (_, s) =>
        s.exists(sp => sp.kind == Kind.PdfLine && sp.text.contains(PageParser.ParseFailMarker))
      }.toLong
    }.sum
}
