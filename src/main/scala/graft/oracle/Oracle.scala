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

  def golden(doc: Doc): Extracted = goldenAndStats(doc)._1

  /** One parse pass per doc yielding the golden Extracted AND the page-level
    * stats (pages, spans, failures, sum page conf) — the golden tables and
    * the metrics oracle share it so corpus-wide golden generation parses
    * each page exactly once.
    */
  def goldenAndStats(doc: Doc): (Extracted, (Long, Long, Long, Long)) = {
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
    // doc avg confidence (tasks.py:365–368): mean of page confs, per-mille floor
    val conf = if (results.isEmpty) 0L
               else results.map(_.confPm.toLong).sum / results.length
    val stats = (results.size.toLong,
      results.map(_.spans.size.toLong).sum,
      results.count(_.parseFailed).toLong,
      results.map(_.confPm.toLong).sum)
    (Extracted(doc.doc_id, out.result(), md, html, conf), stats)
  }

  /** Sequential page-level stats for the metrics oracle: (pages, spans,
    * failures, sum of page confidences in per-mille) for one document.
    */
  def pageStats(doc: Doc): (Long, Long, Long, Long) = goldenAndStats(doc)._2

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
