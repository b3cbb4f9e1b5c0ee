package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Citations
import graft.corpus.{Corpus, WebGen}

/** Content-derived citation extraction: chrome numbers ignored,
  * multi-mention counting, and the planted cross/self edge structure at
  * sf0.001 (re-posts cite their source, fresh pages cite themselves).
  */
class CitationsSpec extends AnyFunSuite {

  private val filler =
    "법원이 인정하는 사실관계는 제출된 증거와 변론 전체의 취지를 종합한 결과이며 " +
      "계약의 성립과 이행 과정 전반에 관한 당사자의 주장을 차례로 살펴본 결과이다"

  test("edges come from extracted content only; chrome mentions are ignored") {
    val spark = SparkSessions.spark
    import spark.implicits._
    // the nav and footer each mention a docket number; only the content
    // paragraph's two mentions (one repeated) may surface
    val html =
      s"""<html><body>
         |<nav><a href="/">사건번호 2026가합77호 바로가기</a></nav>
         |<p>사건번호 2026가합5호 및 2026가합9호 관련. $filler 2026가합5호 참조.</p>
         |<footer>© 2026가합88호 법률 포털</footer>
         |</body></html>""".stripMargin
    val pages = Seq(("d1", html)).toDF("doc_id", "html")
    val got = Citations.extractEdges(pages).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("d1", 5L, 2L), ("d1", 9L, 1L)))
  }

  test("sf0.001 edges: fresh pages self-cite, re-posts cite their source") {
    val spark = SparkSessions.spark
    val sf = "sf0.001"
    val pages = spark.read.parquet(Corpus.ensureWeb(spark, sf))
    val got = Citations.resolve(Citations.extractEdges(pages), pages)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getBoolean(4)))

    val docs = WebGen.specFor(sf).docs.toLong
    assert(got.length === docs) // every page carries exactly one citation
    assert(got.forall(_._3 == 1L)) // planted spans mention each key once
    got.foreach { case (id, cited, _, target, self) =>
      val i = id.stripPrefix("web-").toLong
      val src = if (i % WebGen.DupStride == WebGen.DupStride - 1)
        i - (WebGen.DupStride - 1) else i
      assert(cited === src, s"doc $i")
      // re-post urls live on /p/ so they are never citation TARGETS; the
      // cited /case/ page always exists in-corpus
      assert(target === WebGen.docId(src))
      assert(self === (i == src))
    }
  }
}
