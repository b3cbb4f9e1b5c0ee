package graft.corpus

import graft.model._
import scala.util.Random
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic corpus per FIXTURES.md §1 (no external data).
  *
  * Seeding is per-document (`new Random(docId.hashCode)`) so any subset
  * regenerates identically and generation parallelizes embarrassingly —
  * the same property the reference's per-file work units have
  * (batch_processor.py:24–34).
  *
  * The layout grammar is arranged so every classifier threshold in the parse
  * kernel is exercised with margin (no boundary-ambiguous geometry):
  * body lines h=34 always outnumber headings, so the page median height is 34;
  * h=50 → h1 (1.47×), h=40 → h2 (1.176×); bold density 520‰ vs body 340–360‰.
  */
object CorpusGen {

  final case class Spec(docs: Int, megaPages: Int)

  /** Scale knobs (FIXTURES.md §1). */
  def specFor(sfName: String): Spec = sfName match {
    case "sf0.001" => Spec(100, 64)
    case "sf0.01"  => Spec(1000, 512)
    case "sf0.1"   => Spec(10000, 5000)
    case other =>
      val sf = other.stripPrefix("sf").toDouble
      // mega-doc capped at the reference's "5,000+ pages" case (README.md:7)
      Spec(math.max(1, (100000 * sf).toInt),
        math.min(5000, math.max(8, (50000 * sf).toInt)))
  }

  def docId(i: Long): String = f"doc-$i%09d"

  // ---- deterministic text pools -------------------------------------------

  private val bodyPool = Vector(
    "원고는 피고에게 계약 위반에 따른 손해배상을 청구한다",
    "이 사건 부동산은 서울특별시 강남구에 소재한다",
    "당사자 사이에 다툼이 없는 사실은 다음과 같다",
    "증인의 진술에 의하면 계약 체결 당시 상황은 명확하다",
    "법원은 제반 사정을 종합하여 다음과 같이 판단한다",
    "피고의 주장은 이유 없으므로 이를 기각한다",
    "계약서 제3조에 따라 위약금이 발생한다",
    "원고의 청구는 일부 이유 있어 인용한다",
    "감정인의 감정 결과는 신빙성이 인정된다",
    "양 당사자는 조정 절차에 참여할 의사를 밝혔다")

  /** Typo-bearing templates, all verified correctable by the reference's
    * single-pass cascade (TypoSpec vectors; NB `1oo,ooo원` is NOT correctable
    * and therefore not planted).
    */
  private val typoPool = Vector(
    "원고 갑과 Z는 2o23년 법원에 출석하였다",
    "갑, Z, C 및 T가 서명하였다",
    "Z와 갑이 합의하였다",
    "갑과 2 는 계약을 체결한다",
    "제 1 조 (목적) 이 계약의 목적은 다음과 같다",
    "제  12  항 및 제 3 호 에 따른다",
    "제1o조 제2o항 의 규정을 적용한다",
    "제l조 및 제 l2 조 를 준용한다",
    "금 1o0,o00원 을 지급하라",
    "2o23년 l2월 3l일 까지 이행한다",
    "2023.1.15 자 계약서에 따른다",
    "I. 서론 부분을 참조한다",
    "(I) 첫째 (II) 둘째 사유가 있다",
    "변론기일은 2o24년 3월 l5일 이다",
    "．，기호가 섞인 ，문장이다",
    "기간은 2023.1.1 부터 2023.l2.3l 까지다")

  private val headingPool = Vector(
    "소 장", "판 결", "주 문", "청구취지", "청구원인", "이 유",
    "증거목록", "당사자표시", "첨부서류")

  private val cellPool = Vector(
    "사건", "금액", "날짜", "비고", "제1o조", "1o0,o00원", "원고", "피고",
    "2o23년", "항목", "수량", "합계", "계약금", "잔금", "이자")

  private val htmlContentPool = Vector(
    "이 사건의 본문 내용은 당사자 간 계약의 성립과 이행 과정 전반에 관한 것이다",
    "법원이 인정하는 사실관계는 제출된 증거와 변론 전체의 취지를 종합한 결과이다",
    "계약 해석에 있어 당사자의 진정한 의사가 문언보다 우선한다는 것이 판례의 태도이다",
    "손해배상의 범위는 통상손해를 원칙으로 하고 특별손해는 예견가능성이 있는 경우에 한한다")

  private val boilerplatePool = Vector(
    "홈 로그인 회원가입", "이전글 다음글 목록", "광고 배너 영역",
    "사이트맵 이용약관", "검색 메뉴 닫기")

  private val captionPool = Vector(
    "증거사진 1", "계약서 사본", "등기부등본", "현장 사진", "")

  private def pick[A](rng: Random, xs: Vector[A]): A = xs(rng.nextInt(xs.length))

  // ---- per-document generation --------------------------------------------

  def genDoc(i: Long, spec: Spec): Doc = {
    val id = docId(i)
    val rng = new Random(id.hashCode.toLong)
    val pages =
      if (i == 0) spec.megaPages
      else {
        val u = rng.nextDouble()
        val g = math.log(1 - u) / math.log(0.875)
        1 + math.min(47.0, if (g.isNaN || g.isInfinite) 47.0 else g).toInt
      }
    val spans = ArrayBuffer.empty[InSpan]
    var offset = 0
    def emit(kind: String, text: String, mediaRef: String = ""): Unit = {
      spans += InSpan(kind, text, mediaRef, offset)
      offset += 1
    }
    var tblIdx = 0
    var imgIdx = 0

    for (p <- 1 to pages) {
      emit(Kind.PageBreak, s"page:$p")
      var y = 120
      var nBody = 0
      var nSpecial = 0 // headings + bold: must stay < body count for stable medians

      def line(h: Int, x: Int, w: Int, density: Int, raw: String, gapAfter: Int): Unit = {
        val stroke = 180 + rng.nextInt(120)
        val conf = 900 + rng.nextInt(100)
        emit(Kind.PdfLine, s"$y|$x|$w|$h|$density|$stroke|$conf|$raw")
        y += h + gapAfter
      }
      def bodyLine(gap: Int = 18): Unit = {
        val raw = if (rng.nextDouble() < 0.35) pick(rng, typoPool) else pick(rng, bodyPool)
        line(34, 300, 1800, 340 + rng.nextInt(21), raw, gap)
        nBody += 1
      }

      // page 1 gets a centered h1 title (the 소장 head)
      if (p == 1) {
        line(50, 980, 520, 350, pick(rng, headingPool), 60)
        nSpecial += 1
      }
      // a few body lines to anchor the median
      val bodies = 4 + rng.nextInt(4)
      for (_ <- 0 until bodies) bodyLine(if (rng.nextDouble() < 0.25) 30 else 18)

      // optional h2 section heading
      if (rng.nextDouble() < 0.5 && nSpecial + 1 < nBody) {
        line(40, 300, 700, 350, pick(rng, headingPool), 30)
        nSpecial += 1
        bodyLine()
      }
      // optional bold line
      if (rng.nextDouble() < 0.3 && nSpecial + 1 < nBody) {
        line(34, 300, 1100, 520, pick(rng, bodyPool), 18)
        nSpecial += 1
      }
      // optional indented line (x - minX = 60 >= 20)
      if (rng.nextDouble() < 0.3) { line(34, 360, 1500, 345, pick(rng, bodyPool), 18); nBody += 1 }
      // optional centered line (w=520 at x=980) and right-aligned line
      if (rng.nextDouble() < 0.2) { line(34, 980, 520, 350, pick(rng, bodyPool), 60) }
      if (rng.nextDouble() < 0.15) { line(34, 2000, 300, 350, "2o23년 l2월 3l일", 90) }

      // bordered region (~30% of pages), possibly with masked lines inside
      if (rng.nextDouble() < 0.3) {
        val rh = 400 + rng.nextInt(300)
        val ry = y
        val cols = 2 + rng.nextInt(2)
        val rows = 2 + rng.nextInt(3)
        val malformed = rng.nextDouble() < 0.25
        val grid = (0 until rows).map { _ =>
          val cells = (0 until cols).map(_ => pick(rng, cellPool))
          if (malformed) cells.mkString("|") else cells.mkString("| ", " | ", " |")
        }.mkString("\n")
        val ref = s"media/tbl-$i-$tblIdx.png"; tblIdx += 1
        val conf = 600 + rng.nextInt(390) // model path, clears the 0.4 gate
        emit(Kind.PdfRegion, s"$ry|280|1900|$rh|1|$conf|$grid", ref)
        // masked lines fully inside the region box (layout masking path)
        if (rng.nextDouble() < 0.5) {
          val n = 1 + rng.nextInt(2)
          for (k <- 0 until n) {
            val my = ry + 50 + 60 * k
            val stroke = 200; val conf = 950
            emit(Kind.PdfLine, s"$my|340|300|30|350|$stroke|$conf|표 내부 텍스트 $k")
          }
        }
        y = ry + rh + 40
        // every ~20th doc: an overlapping heuristic region that gets
        // suppressed (w*h = 1500*300 = 450k clears the 5% area gate, so the
        // drop is attributable to IoU suppression, not the area filter)
        if (i % 20 == 3 && p == 1) {
          emit(Kind.PdfRegion, s"${ry + 100}|300|1500|300|0|500|중복|영역", s"media/tbl-$i-$tblIdx.png")
          tblIdx += 1
        }
      }

      // low-confidence bordered detection (~8%): conf < 0.4 → the model-path
      // confidence filter drops it (layout_analyzer.py:209); no masked lines
      // planted inside (an undetected region masks nothing)
      if (rng.nextDouble() < 0.08) {
        val conf = 150 + rng.nextInt(250)
        val ref = s"media/tbl-$i-$tblIdx.png"; tblIdx += 1
        emit(Kind.PdfRegion, s"$y|300|1600|350|1|$conf|저신뢰|표", ref)
        y += 60 // region dropped; reserve minimal vertical space
      }

      // standalone heuristic (borderless) region (~15%): w*h >= 510k always
      // clears the 5% area gate (435k)
      if (rng.nextDouble() < 0.15) {
        val rh = 300 + rng.nextInt(200)
        val grid = (0 until 2 + rng.nextInt(2)).map { _ =>
          Seq(pick(rng, cellPool), pick(rng, cellPool)).mkString("|")
        }.mkString("\n")
        val ref = s"media/tbl-$i-$tblIdx.png"; tblIdx += 1
        emit(Kind.PdfRegion, s"$y|300|1700|$rh|0|700|$grid", ref)
        y += rh + 40
      }

      // tiny heuristic region (~6%): 500*200 = 100k px^2 < 5% of the page →
      // dropped by the heuristic-path area filter (layout_analyzer.py:280)
      if (rng.nextDouble() < 0.06) {
        val ref = s"media/tbl-$i-$tblIdx.png"; tblIdx += 1
        emit(Kind.PdfRegion, s"$y|300|500|200|0|700|소형|영역", ref)
        y += 40
      }

      // borderless cluster of aligned lines (~20%): 2-3 rows x 2-3 cols
      if (rng.nextDouble() < 0.2) {
        val cRows = 2 + rng.nextInt(2)
        val cCols = 2 + rng.nextInt(2)
        val xs = Vector(300, 1050, 1800)
        for (r <- 0 until cRows) {
          for (c <- 0 until cCols) {
            val stroke = 200 + rng.nextInt(50)
            val conf = 930 + rng.nextInt(60)
            emit(Kind.PdfLine, s"$y|${xs(c)}|200|34|350|$stroke|$conf|${pick(rng, cellPool)}")
          }
          y += 60
        }
        y += 40
      }

      // media span (~20%)
      if (rng.nextDouble() < 0.2) {
        emit(Kind.Media, pick(rng, captionPool), s"media/img-$i-$imgIdx.jpg")
        imgIdx += 1
      }

      // html blocks (~40%): content kept, boilerplate dropped
      if (rng.nextDouble() < 0.4) {
        val n = 1 + rng.nextInt(3)
        for (_ <- 0 until n) {
          if (rng.nextDouble() < 0.55) {
            val depth = 1 + rng.nextInt(3)
            val tag = pick(rng, Vector("p", "div", "article", "section"))
            val link = rng.nextInt(4)
            emit(Kind.HtmlBlock, s"$depth|$tag|$link|${pick(rng, htmlContentPool)}")
          } else {
            val depth = 4 + rng.nextInt(4)
            val tag = pick(rng, Vector("nav", "footer", "aside", "header"))
            val link = 40 + rng.nextInt(80)
            emit(Kind.HtmlBlock, s"$depth|$tag|$link|${pick(rng, boilerplatePool)}")
          }
        }
      }

      // poison line → parse-failure path (~0.5% of pages)
      if (rng.nextDouble() < 0.005) {
        emit(Kind.PdfLine, s"$y|300|1800|34|350|200|950|<<PARSE_FAIL>> 손상된 라인")
        y += 52
      }
    }
    Doc(id, spans.toSeq)
  }

  /** All docs of a spec, sequentially (oracle / tests). */
  def genAll(spec: Spec): Iterator[Doc] =
    Iterator.range(0L, spec.docs.toLong).map(genDoc(_, spec))
}
