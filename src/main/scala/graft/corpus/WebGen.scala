package graft.corpus

import graft.model.OutSpan
import graft.parse.MainContent
import scala.util.Random
import scala.collection.mutable.ArrayBuffer

/** Deterministic wild-web page generator with PLANTED ground truth for the
  * raw-HTML main-content extractor ([[graft.parse.MainContent]]).
  *
  * Unlike the `golden_*` tables (sequential restatements of the same parse
  * kernels), the truth here is INDEPENDENT of the extractor: the generator
  * decides which blocks are article content when it lays the page out, and
  * the gate asserts the extractor recovers exactly that plant. Every
  * heuristic the extractor uses is exercised by construction:
  *
  *  - semantic/classed chrome: `header`/`nav`/`aside`/`footer` subtrees and
  *    `class="related"` boxes full of links — must drop (class-hint + link
  *    density);
  *  - a LINK FARM paragraph with no bad class and plenty of text — must
  *    drop on link density alone;
  *  - a DEEP PROMO subtree: long clean text nested > DepthSlack levels
  *    below the article — must drop on the depth band alone;
  *  - short connectors between long paragraphs, an `h2` headline before
  *    the first paragraph, figures with captions — must all be KEPT via
  *    context smoothing (short-between-good, headline promotion, media
  *    linking), none of which a per-block score can decide;
  *  - entities (`&amp;`), an inline citation link inside a long paragraph
  *    (low link density must NOT flag it), scripts/styles/comments with
  *    `<` in their bodies.
  *
  * Seeding is per-document (same contract as [[CorpusGen]]): any subset
  * regenerates identically, so generation parallelizes embarrassingly and
  * the planted truth can be re-derived on any executor.
  */
object WebGen {

  def docId(i: Long): String = f"web-$i%09d"

  /** Deterministic crawl URL per page: fresh pages spread over seven portal
    * hosts, re-posts live on the repost host. The url column is part of the
    * pages table — canonical hrefs resolve to target pages by joining this
    * column, exactly as a production crawl resolves them against its own
    * URL index.
    */
  def url(i: Long): String =
    if (i % DupStride == DupStride - 1) s"https://repost-archive.example/p/$i"
    else s"https://portal-${i % 7 + 1}.law.example/case/$i"

  /** Pages share the corpus Spec's doc count (FIXTURES.md §1). */
  def specFor(sfName: String): CorpusGen.Spec = CorpusGen.specFor(sfName)

  /** Every host the crawl URLs span (the per-host robots table's key set). */
  def hosts: Vector[String] =
    (1 to 7).map(k => s"portal-$k.law.example").toVector :+ "repost-archive.example"

  /** Deterministic per-host robots.txt plant for the RFC 9309 admission
    * gate. The bodies exercise every REP feature the evaluator implements —
    * comments, mixed-case directives, agent-specific groups overriding `*`,
    * the empty-Disallow allow-all idiom, `*` wildcards, `$` anchors,
    * longest-match precedence with Allow winning the specificity race —
    * and the resulting verdict for agent "graftbot" is a CLOSED FORM of the
    * URL alone (the oracle restates it in pure SQL, independent of the
    * parser):
    *  - portal-3: the graftbot group alone applies → disallowed iff the
    *    path ends in `3`;
    *  - other portals: the `*` group → disallowed iff the path ends in `7`,
    *    UNLESS it ends in `77` (the longer Allow wins);
    *  - repost-archive: `Disallow: /` with `Allow: /p/1` → allowed iff the
    *    page number starts with `1`.
    */
  def robotsTxt(host: String): String =
    if (host == "repost-archive.example")
      """# re-posting platform: closed by default, one open shard
        |User-Agent: *
        |Disallow: /
        |Allow: /p/1
        |""".stripMargin
    else if (host == "portal-3.law.example")
      """# portal-3 carves a crawler-specific policy
        |User-agent: graftbot
        |Disallow: /case/*3$
        |
        |User-agent: *
        |Disallow: /case/
        |""".stripMargin
    else
      """# default portal policy  # (trailing comment exercised)
        |User-agent: otherbot
        |Disallow:
        |
        |user-AGENT: *
        |DisAllow: /case/*7$
        |Allow: /case/*77$
        |Crawl-delay: 2
        |""".stripMargin

  // ---- sitemap plant (discovery reconciliation, ops/Sitemaps.scala) -------

  /** Listing rule for crawled pages: every host's sitemap OMITS pages whose
    * id ends in 3 — those crawled-but-unlisted pages are the reconcile op's
    * planted "orphan" truth, a pure function of the URL the oracle restates
    * in SQL.
    */
  def sitemapListed(i: Long): Boolean = i % 10 != 3

  /** Planted `<lastmod>` per listed id, the same closed form on both sides:
    * the generator WRITES it into the XML, the engine PARSES it back out,
    * and the oracle recomputes it as `DATE '2025-01-01' + id % 400` — so a
    * lastmod that survives parsing un-mangled is part of the gate.
    */
  def sitemapLastmod(i: Long): String =
    java.time.LocalDate.of(2025, 1, 1).plusDays(i % 400).toString

  /** Frontier plant: listed-but-never-crawled URLs (the discovery signal a
    * crawler schedules next). Ids start at 9·10⁸ — beyond any crawled id up
    * to sf9000 — so they can never collide with a page URL. Five per portal
    * host plus five on the re-post host.
    */
  def frontierIds(host: String): Vector[Long] =
    if (host == "repost-archive.example")
      (0 to 4).map(j => 900000080L + j).toVector
    else {
      val k = host.stripPrefix("portal-").takeWhile(_.isDigit).toLong
      (0 to 4).map(j => 900000000L + k * 10 + j).toVector
    }

  /** Every sitemap FILE the crawl fetched, as (host, path) rows. The seven
    * portals each publish a flat `<urlset>` at the well-known root path;
    * the re-post host publishes a `<sitemapindex>` there referencing two
    * children, PLUS a stale orphaned urlset (`/sitemaps/stale.xml`) nothing
    * references — reachability from the root must exclude it.
    */
  def sitemapFiles: Vector[(String, String)] =
    hosts.filterNot(_ == "repost-archive.example").map((_, "/sitemap.xml")) ++
      Vector(
        ("repost-archive.example", "/sitemap.xml"),
        ("repost-archive.example", "/sitemaps/part-0.xml"),
        ("repost-archive.example", "/sitemaps/part-1.xml"),
        ("repost-archive.example", "/sitemaps/stale.xml"))

  /** Render one planted sitemap body. Shapes exercised, all of which the
    * parser must tolerate and the TRAPS of which the gate would catch:
    *  - `<urlset>` entries carry optional `<changefreq>`/`<priority>`
    *    children (ignored) and varied indentation;
    *  - the re-post root is a `<sitemapindex>` whose children are resolved
    *    by a (host, path) self-join — one level, per the protocol;
    *  - portal-5's file plants one CROSS-HOST entry (a portal-6 page whose
    *    id ends in 3): the protocol restricts a sitemap to its own host, so
    *    accepting it would flip that page's planted "orphan" status;
    *  - `/sitemaps/stale.xml` is unreachable from any root and lists both a
    *    /p/ URL and a cross-host URL that would each surface as a phantom
    *    row if reachability or host validation leaked.
    */
  def sitemapXml(host: String, path: String, docs: Long): String = {
    val sb = new StringBuilder("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    def entry(loc: String, id: Long): Unit = {
      sb.append("  <url>\n    <loc>").append(loc).append("</loc>\n")
        .append("    <lastmod>").append(sitemapLastmod(id)).append("</lastmod>\n")
      if (id % 3 == 0) sb.append("    <changefreq>weekly</changefreq>\n")
      if (id % 5 == 0) sb.append("    <priority>0.8</priority>\n")
      sb.append("  </url>\n")
    }
    if (host != "repost-archive.example") {
      val k = host.stripPrefix("portal-").takeWhile(_.isDigit).toLong
      sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      var i = k - 1 // portal k owns ids ≡ k-1 (mod 7)
      while (i < docs) {
        if (i % DupStride != DupStride - 1 && sitemapListed(i)) entry(url(i), i)
        i += 7
      }
      frontierIds(host).foreach(f =>
        entry(s"https://$host/case/$f", f))
      // cross-host trap: portal-6's page 33 is never listed by its own host
      // (33 ends in 3) — accepting this entry would flip it orphan→both
      if (k == 5 && docs > 33)
        entry("https://portal-6.law.example/case/33", 33)
      sb.append("</urlset>\n")
    } else if (path == "/sitemap.xml") {
      sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      for (p <- 0 to 1)
        sb.append("  <sitemap>\n    <loc>https://repost-archive.example/sitemaps/part-")
          .append(p).append(".xml</loc>\n  </sitemap>\n")
      sb.append("</sitemapindex>\n")
    } else if (path == "/sitemaps/stale.xml") {
      sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      entry("https://repost-archive.example/p/403", 403) // omitted id (ends in 3)
      entry("https://portal-4.law.example/case/3", 3)    // cross-host AND unreachable
      sb.append("</urlset>\n")
    } else {
      val p = path.stripPrefix("/sitemaps/part-").stripSuffix(".xml").toInt
      sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      var m = 0L // re-posts are ids 101·m + 100; children split on m parity
      while (m * DupStride + (DupStride - 1) < docs) {
        val i = m * DupStride + (DupStride - 1)
        if (m % 2 == p && sitemapListed(i)) entry(url(i), i)
        m += 1
      }
      if (p == 0) frontierIds(host).foreach(f =>
        entry(s"https://$host/p/$f", f))
      sb.append("</urlset>\n")
    }
    sb.toString
  }

  // ---- text pools (Korean legal register, same voice as CorpusGen) --------

  private val sentencePool = Vector(
    "이 사건의 본문 내용은 당사자 간 계약의 성립과 이행 과정 전반에 관한 것이다",
    "법원이 인정하는 사실관계는 제출된 증거와 변론 전체의 취지를 종합한 결과이다",
    "계약 해석에 있어 당사자의 진정한 의사가 문언보다 우선한다는 것이 판례의 태도이다",
    "손해배상의 범위는 통상손해를 원칙으로 하고 특별손해는 예견가능성이 있는 경우에 한한다",
    "당사자 사이에 다툼이 없는 사실과 증거에 의하여 인정되는 사실은 다음과 같다",
    "원고의 청구 중 일부는 이유 있으므로 인용하고 나머지 청구는 기각하기로 한다",
    "감정인의 감정 결과와 증인의 진술은 그 신빙성이 인정되어 사실 인정의 자료가 된다",
    "계약서 제3조와 제7조의 해석에 관하여 당사자의 주장이 첨예하게 대립하고 있다")

  private val titlePool = Vector(
    "손해배상 청구 사건의 쟁점 정리", "계약 해석에 관한 판례 동향",
    "부동산 매매계약 분쟁의 판단 기준", "위약금 약정의 효력 범위")

  private val connectorPool = Vector(
    "다음 항목을 차례로 살핀다.", "구체적 판단은 아래와 같다.",
    "이에 대한 근거는 다음과 같다.", "관련 법리를 먼저 본다.")

  private val captionPool = Vector(
    "증거사진 1: 계약 체결 현장", "별지 1: 계약서 사본",
    "도표 1: 대금 지급 내역", "현장 사진: 이 사건 부동산")

  private val navPool = Vector(
    "홈", "판례검색", "법령정보", "커뮤니티", "공지사항", "이용안내", "로그인")

  private val linkFarmPool = Vector(
    "대법원 2023다1234 판결 전문 보기", "서울고등법원 항소심 판결 요지",
    "관련 법령 민법 제390조 해설", "유사 사건 손해배상 산정례 모음",
    "전문가 칼럼 위약금 감액 기준")

  private val promoPool = Vector(
    "지금 가입하시면 판례 전문 열람 서비스를 한 달간 무료로 이용하실 수 있으며 전문 변호사의 해설 영상 강의와 주요 판결 속보 알림까지 모두 제공됩니다",
    "프리미엄 구독 회원에게는 대법원 주요 판결의 심층 분석 리포트와 쟁점별 판례 비교 자료를 매주 정리하여 이메일로 보내드리고 있습니다")

  /** Editor notes a re-posting site prepends to NEAR-duplicate re-posts —
    * long enough (≥ GoodLen non-ws chars) to stand as content on their own
    * evidence, so the near-dup plant's extracted truth diverges from the
    * source by exactly one leading span plus one trailing drop.
    */
  private val editorNotePool = Vector(
    "편집자 주석으로 이 글은 원문 게시판에서 옮겨 온 것이며 일부 문단은 분량 문제로 생략되었고 원저자의 동의를 받아 재게시되었음을 밝혀 둡니다",
    "본 게시물은 외부 기고문을 재편집한 것으로 마지막 단락은 편집 과정에서 제외되었으며 인용 시 원문 출처를 함께 표기하여 주시기 바랍니다")

  private def pick[A](rng: Random, xs: Vector[A]): A = xs(rng.nextInt(xs.length))

  /** Planted page-level metadata truth, decided at layout time: the crawl
    * URL, the head title, whether a robots-noindex meta was planted, the
    * planted canonical href ("" if none), and — for re-post pages — the
    * source page id plus the duplication kind (`exact` re-render or `near`:
    * editor note prepended, last paragraph dropped). `dup_src`/`dup_kind`
    * are "" for fresh pages.
    */
  final case class WebMeta(
      doc_id: String, url: String, title: String, noindex: Boolean,
      canonical: String, dup_src: String, dup_kind: String,
      soft404: Boolean, prev_url: String = "", next_url: String = "",
      alt_group: String = "", alt_lang: String = "", published: String = "")

  /** Planted BLOCK-level truth, decided at layout time: every block the
    * segmenter must produce for the page — its innermost block tag, its
    * whitespace-collapsed entity-decoded text ("" for image-only blocks),
    * its image count, whether it is article content (the layout decision,
    * which [[MainContent.finalKeep]] must reproduce), and its page-global
    * encounter order. This pins the SEGMENTATION layer (lexer + block
    * boundaries + text normal form) independently of the keep heuristics
    * the span truth already gates: a segmentation bug that merged or split
    * chrome blocks would be invisible to the span gate (chrome is dropped
    * either way) but breaks this one.
    */
  final case class WebBlock(
      tag: String, text: String, is_content: Boolean, n_media: Int, ord: Int)

  /** One generated page: raw markup + the planted main-content truth + the
    * planted outlink truth (every `<a href>` the generator lays down, with
    * its anchor text, whether it sits in article content or chrome, its
    * rel-nofollow mark, and its page-global emission order — decided at
    * layout time, independent of [[MainContent.outlinks]]) + the planted
    * page metadata + the planted block segmentation.
    */
  final case class WebPage(
      doc_id: String, html: String, truth: Vector[OutSpan],
      links: Vector[MainContent.Outlink], meta: WebMeta,
      blocks: Vector[WebBlock])

  /** Planted link text is recorded in the span contract's normal form
    * (whitespace-collapsed), e.g. a pool excerpt cut at a space boundary.
    */
  private def collapse(s: String): String =
    s.split("\\s+").filter(_.nonEmpty).mkString(" ")

  /** Every `DupStride`-th page is a CONTENT DUPLICATE of the page
    * `DupStride-1` earlier: same main content, completely different chrome
    * (a re-posting site skin). Raw-HTML hashing can NEVER pair these — only
    * extract-then-dedup can, which is exactly why boilerplate removal
    * precedes dedup in every corpus pipeline (C4, CCNet). The truth is the
    * source page's truth verbatim.
    */
  val DupStride = 101

  // ---- head-metadata plants (pagination / hreflang / JSON-LD) ------------
  // All three are PURE functions of (i, docs): no rng draws, so every other
  // planted truth and the rev-2 byte-identity argument are untouched, and
  // the oracle can restate each rule in closed form.

  /** Pagination-chain plant: every `ChainStride`-th fresh page heads a
    * `ChainLen`-page serialized article — consecutive ids linked by
    * `rel="next"` / `rel="prev"` head links, the way real CMSes paginate
    * long pieces. Chains never include a re-post index (re-posts render a
    * different head codepath) and never run past the corpus end.
    * Returns the chain's head id, or -1 if page `i` is not in a chain.
    */
  val ChainStride = 89L
  val ChainLen = 3

  def chainBase(i: Long, docs: Long): Long = {
    val r = i % ChainStride
    val base = if (r >= 2 && r < 2 + ChainLen) i - (r - 2) else -1L
    if (base >= 0 && base + ChainLen <= docs &&
        (0 until ChainLen).forall(k => (base + k) % DupStride != DupStride - 1))
      base
    else -1L
  }

  /** Hreflang plant: every `AltStride`-th fresh page pairs with its
    * successor as a two-language alternate cluster (ko = the base page,
    * en = base+1); BOTH pages declare the full alternate set, self
    * included, per Google's reciprocity requirement. Every 5th cluster is
    * deliberately ONE-SIDED — the base declares, the partner doesn't (the
    * single most common hreflang deployment bug) — so the engine's
    * reciprocity validation is non-degenerate: those clusters must be
    * rejected from the output, and the planted truth records no group for
    * them. Returns the cluster's base id, or -1 if page `i` declares
    * nothing.
    */
  val AltStride = 73L

  def altBase(i: Long, docs: Long): Long = {
    val r = i % AltStride
    val base = if (r == 4L || r == 5L) i - (r - 4) else -1L
    val ok = base >= 0 && base + 1 < docs &&
      base % DupStride != DupStride - 1 &&
      (base + 1) % DupStride != DupStride - 1
    if (!ok) -1L
    // the one-sided plant: the partner page stays silent
    else if (altOneSided(base) && i != base) -1L
    else base
  }

  /** Whether the cluster at `base` is planted one-sided (reciprocity must
    * fail). A pure stride rule so the oracle can restate it.
    */
  def altOneSided(base: Long): Boolean = base % (AltStride * 5) == 4

  /** JSON-LD plant: every fresh NON-error page carries a NewsArticle
    * structured-data block (`<script type="application/ld+json">`) whose
    * headline is the page's head title and whose datePublished is this
    * closed form of the id. Error pages and re-posts carry none — scraped
    * skins don't maintain structured data, which is exactly why corpus
    * metadata enrichment must treat it as optional.
    */
  def publishedDate(i: Long): String =
    f"2026-${i % 12 + 1}%02d-${i % 28 + 1}%02d"

  /** Minimal JSON string escaping for generator-emitted ld+json payloads
    * (quotes, backslashes, control chars — the titles are plain Korean
    * prose, but the payload must stay valid JSON for any pool edit).
    */
  def jsonEsc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  // ---- recrawl (revision 2) plant ----------------------------------------
  // A second crawl of the same sites, some time later: every 37th fresh
  // page's article was UPDATED (one sentence appended to the lead — a
  // deterministic constant, so no rng draw moves and every other page is
  // byte-identical across revisions), every 53rd page is GONE (hard 404 at
  // recrawl time — it simply isn't in the rev-2 table), and ~2% new pages
  // were published past the rev-1 id range. Re-posts inherit change from
  // their SOURCE (they re-render its content), never from their own index.
  val Rev2ChangeStride = 37
  val Rev2RemoveStride = 53
  val Rev2UpdateNote = " 항소심 판단이 반영되어 본 문서의 요지가 일부 갱신되었다."

  /** Whether page `i`'s EXTRACTED CONTENT differs between rev 1 and rev 2.
    * Soft-404 pages have no lead paragraph, so the update never lands on
    * them; re-posts change iff their source changed (the editor note and
    * trim rules are revision-independent).
    */
  def changedInRev2(i: Long): Boolean =
    if (i % DupStride == DupStride - 1) changedInRev2(i - (DupStride - 1))
    else i % Rev2ChangeStride == 5 && i % 257 != 13

  /** Planted recrawl-delta truth for page id `i` given the rev-1 corpus
    * size: "added" / "removed" / "changed", or "" for unchanged pages
    * (removal wins over change — a page that is gone has no content to
    * differ).
    */
  def rev2Status(i: Long, docs: Long): String =
    if (i >= docs) "added"
    else if (i % Rev2RemoveStride == 7) "removed"
    else if (changedInRev2(i)) "changed"
    else ""

  /** Rev-2 id range: the recrawl discovers ~2% new pages past the rev-1
    * range (at least 8, so every gate scale plants some).
    */
  def rev2Docs(docs: Long): Long = docs + math.max(docs / 50, 8L)

  def genPage(i: Long, spec: CorpusGen.Spec): WebPage = genPage(i, spec, rev = 1)

  def genPage(i: Long, spec: CorpusGen.Spec, rev: Int): WebPage =
    if (i % DupStride == DupStride - 1) genDup(i, spec, rev)
    else genFresh(i, spec, rev)

  private def genDup(i: Long, spec: CorpusGen.Spec, rev: Int): WebPage = {
    val id = docId(i)
    // the source index is ≡ 0 (mod DupStride), so it is always a fresh page
    val srcIdx = i - (DupStride - 1)
    val src = genPage(srcIdx, spec, rev)
    val rng = new Random(id.hashCode.toLong ^ 0x5ca1ab1eL)
    // variant decisions, drawn in a fixed order so the plant is a pure
    // function of the doc id: NEAR re-posts prepend an editor note and drop
    // the trailing paragraph (raw-hash AND exact-content dedup both miss
    // them — only near-dup over extracted content pairs them); about half
    // the re-posts declare their source via rel=canonical; some are marked
    // noindex by the re-posting platform
    val near = rng.nextDouble() < 0.4
    val canon = rng.nextDouble() < 0.5
    val noindex = rng.nextDouble() < 0.25
    // the note carries the re-post's own document number, so every near
    // re-post's leading span is UNIQUE — two near re-posts of different
    // sources can never share a (note, heading) 2-shingle, which keeps the
    // planted pair set free of cross-pair collisions at any corpus size
    val note = pick(rng, editorNotePool) + s" 문서번호 제${i}호."
    val truth: Vector[OutSpan] =
      if (!near) src.truth
      else {
        // drop the trailing paragraph, then keep trimming until the new
        // last span is a span the extractor keeps WITHOUT help from a
        // following neighbor — a GOOD-length text block. A terminal
        // caption, connector or figure would be dropped by context
        // smoothing (chrome follows it), putting the plant at odds with
        // the extractor's own contract. The trim is BOUNDED: at most 2
        // spans dropped and at least 4 kept, else the variant degrades to
        // note-only — this floors the planted pair's span-shingle Jaccard
        // at 500‰ (trimmed: (k-1)/m with k ≥ 4, m ≤ k+2; note-only:
        // (m-1)/m ≥ 750‰), so every plant clears the 400‰ gate threshold
        // with margin at ANY page size, mega included.
        var keep = src.truth.dropRight(1)
        while (keep.nonEmpty && !(keep.last.kind == MainContent.KindText &&
            keep.last.text.count(!_.isWhitespace) >= MainContent.GoodLen))
          keep = keep.dropRight(1)
        val body =
          if (keep.length >= 4 && keep.length >= src.truth.length - 2) keep
          else src.truth
        (OutSpan(MainContent.KindText, note, "", 0) +: body)
          .zipWithIndex.map { case (s, k) => s.copy(order = k) }
      }
    def esc(s: String): String = s.replace("&", "&amp;")
    val links = ArrayBuffer.empty[MainContent.Outlink]
    def plantLink(href: String, text: String, fromContent: Boolean,
                  nofollow: Boolean = false): Unit =
      links += MainContent.Outlink(href, collapse(text), fromContent,
        nofollow, links.size)
    // block recording is ADDITIVE: it draws nothing from rng, so the page
    // markup and every other planted truth are byte-identical with or
    // without it (same contract as link/meta recording)
    val blks = ArrayBuffer.empty[WebBlock]
    def blk(tag: String, text: String, content: Boolean, nMedia: Int = 0): Unit =
      blks += WebBlock(tag, text, content, nMedia, blks.size)
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<html>\n<head><title>판례 모음 - 재게시</title>\n")
    if (canon)
      sb.append("<link rel=\"canonical\" href=\"").append(url(srcIdx)).append("\"/>\n")
    if (noindex)
      sb.append("<meta name=\"robots\" content=\"noindex, follow\"/>\n")
    sb.append("</head>\n<body>\n")
      // chrome families DISJOINT from the fresh skin: a link-only banner
      // (dropped on link density), a breadcrumb nav, a link-farm footer
      .append("<div id=\"promo-banner\"><a href=\"/join\">")
    val bannerText = pick(rng, promoPool).take(40)
    sb.append(bannerText).append("</a></div>\n")
      .append("<header><nav class=\"breadcrumb\">")
    plantLink("/join", bannerText, fromContent = false)
    blk("div", collapse(bannerText), content = false)
    val crumbs = Vector.fill(3 + rng.nextInt(5))(pick(rng, navPool))
    crumbs.zipWithIndex.foreach { case (crumb, k) =>
      sb.append("<a href=\"/c").append(k).append("\">")
        .append(crumb).append("</a> &gt; ")
      plantLink(s"/c$k", crumb, fromContent = false)
    }
    // every crumb is followed by an escaped '>' separator, the last one
    // included, so the block's normal form ends with a bare '>'
    blk("nav", crumbs.map(_ + " >").mkString(" "), content = false)
    sb.append("</nav></header>\n<main class=\"post-body\">\n")
    val t = truth
    var k = 0
    while (k < t.length) {
      val s = t(k)
      if (s.kind == MainContent.KindMedia) {
        // the generator always plants a figure's caption text right after
        // its media span — re-render them as one figure
        require(k + 1 < t.length && t(k + 1).kind == MainContent.KindText,
          s"media span without caption at $k in ${src.doc_id}")
        sb.append("<figure><img src=\"").append(s.media_ref).append("\"/>")
          .append("<figcaption>").append(esc(t(k + 1).text))
          .append("</figcaption></figure>\n")
        blk("figure", "", content = true, nMedia = 1)
        blk("figcaption", t(k + 1).text, content = true)
        k += 2
      } else if (s.kind == MainContent.KindHeading) {
        sb.append("<h2>").append(esc(s.text)).append("</h2>\n")
        blk("h2", s.text, content = true); k += 1
      } else {
        sb.append("<p>").append(esc(s.text)).append("</p>\n")
        blk("p", s.text, content = true); k += 1
      }
    }
    sb.append("</main>\n<footer class=\"footer\">")
    val farmTexts = Vector.fill(2 + rng.nextInt(3)) {
      val t = pick(rng, linkFarmPool)
      val nf = rng.nextDouble() < 0.5 // re-post platforms nofollow their farms
      sb.append("<a href=\"#\"").append(if (nf) " rel=\"nofollow\"" else "")
        .append(">").append(t).append("</a> ")
      plantLink("#", t, fromContent = false, nofollow = nf)
      t
    }
    sb.append("© 재게시 플랫폼</footer>\n</body>\n</html>\n")
    // farm anchors and the copyright run share the one footer block
    blk("footer", farmTexts.mkString(" ") + " © 재게시 플랫폼", content = false)
    // the re-render emits the (possibly near-modified) truth as PLAIN text
    // (inline citation anchors do not survive re-posting), so a dup page
    // plants zero content links — every link is chrome
    WebPage(id, sb.toString, truth, links.toVector,
      WebMeta(id, url(i), "판례 모음 - 재게시", noindex,
        if (canon) url(srcIdx) else "", src.doc_id,
        if (near) "near" else "exact",
        // a re-post of an error page carries the error content — the
        // content-shaped detector must flag it too (near variants
        // included: note + heading + notice is still ≤ the span ceiling)
        soft404 = src.meta.soft404),
      blks.toVector)
  }

  private def genFresh(i: Long, spec: CorpusGen.Spec, rev: Int = 1): WebPage = {
    val id = docId(i)
    val rng = new Random(id.hashCode.toLong)
    val sb = new StringBuilder
    val truth = ArrayBuffer.empty[OutSpan]
    var order = 0
    def plant(kind: String, text: String, ref: String = ""): Unit = {
      truth += OutSpan(kind, text, ref, order); order += 1
    }
    val links = ArrayBuffer.empty[MainContent.Outlink]
    def plantLink(href: String, text: String, fromContent: Boolean,
                  nofollow: Boolean = false): Unit =
      links += MainContent.Outlink(href, collapse(text), fromContent,
        nofollow, links.size)
    // block recording is ADDITIVE: no rng draws, so the markup and every
    // other planted truth are unchanged by it (see genDup)
    val blks = ArrayBuffer.empty[WebBlock]
    def blk(tag: String, text: String, content: Boolean, nMedia: Int = 0): Unit =
      blks += WebBlock(tag, text, content, nMedia, blks.size)

    // a GOOD paragraph: 3–5 sentences (always ≥ GoodLen non-ws chars),
    // sometimes carrying an entity and/or a short inline citation link
    // (anchor mass far below the density ceiling)
    def paragraph(): Unit = {
      val n = 3 + rng.nextInt(3)
      val parts = ArrayBuffer.fill(n)(pick(rng, sentencePool))
      val withEntity = rng.nextDouble() < 0.3
      if (withEntity) parts += "갑 & 을 양측의 주장을 모두 검토한다"
      val plain = parts.mkString(". ") + "."
      val link = rng.nextDouble() < 0.35
      val anchor = "민법 제390조"
      sb.append("<p>")
      if (link) {
        // anchor goes mid-paragraph: text up to the first period, the
        // citation, then the rest
        val cut = plain.indexOf('.') + 1
        sb.append(esc(plain.substring(0, cut)))
          .append(" <a href=\"/law/390\">").append(anchor).append("</a>")
          .append(esc(plain.substring(cut)))
        val full = plain.substring(0, cut) + " " + anchor + plain.substring(cut)
        plant(MainContent.KindText, full)
        blk("p", full, content = true)
        // the ONLY content link the generator plants: an inline citation
        // inside a kept paragraph
        plantLink("/law/390", anchor, fromContent = true)
      } else {
        sb.append(esc(plain))
        plant(MainContent.KindText, plain)
        blk("p", plain, content = true)
      }
      sb.append("</p>\n")
    }

    def esc(s: String): String = s.replace("&", "&amp;")

    var imgIdx = 0
    def figure(): Unit = {
      val ref = s"media/web-$i-$imgIdx.png"; imgIdx += 1
      val cap = pick(rng, captionPool)
      sb.append("<figure><img src=\"").append(ref).append("\"/>")
        .append("<figcaption>").append(cap).append("</figcaption></figure>\n")
      plant(MainContent.KindMedia, "", ref)
      plant(MainContent.KindText, cap)
      // the <figcaption> boundary splits the figure into an image-only
      // block and a caption block
      blk("figure", "", content = true, nMedia = 1)
      blk("figcaption", cap, content = true)
    }

    def connector(): Unit = {
      val c = pick(rng, connectorPool)
      sb.append("<p>").append(c).append("</p>\n")
      plant(MainContent.KindText, c)
      blk("p", c, content = true)
    }

    def relatedBox(): Unit = {
      sb.append("<div class=\"related\">")
      val texts = Vector.fill(3) {
        val t = pick(rng, linkFarmPool)
        sb.append("<a href=\"#\">").append(t).append("</a> ")
        plantLink("#", t, fromContent = false)
        t
      }
      sb.append("</div>\n")
      blk("div", texts.mkString(" "), content = false)
    }

    def linkFarm(): Unit = {
      // no bad class, plenty of text — only link density can drop it; about
      // half the farm anchors carry rel=nofollow (the SEO-era habit), mixed
      // with other rel tokens so the extractor must token-match, not
      // string-match
      sb.append("<p>추천: ")
      val texts = Vector.fill(4) {
        val t = pick(rng, linkFarmPool)
        val nf = rng.nextDouble() < 0.5
        sb.append("<a href=\"#\"")
          .append(if (nf) " rel=\"nofollow noopener\"" else "")
          .append(">").append(t).append("</a> · ")
        plantLink("#", t, fromContent = false, nofollow = nf)
        t
      }
      sb.append("</p>\n")
      // every anchor is followed by an interpunct separator, the last
      // included
      blk("p", "추천: " + texts.map(_ + " ·").mkString(" "), content = false)
    }

    def deepPromo(): Unit = {
      // clean classes, low link density, long text — nested DepthSlack+2
      // levels below the article so only the depth band drops it
      val nest = MainContent.DepthSlack + 2
      val promo = pick(rng, promoPool)
      sb.append("<div>" * nest)
        .append(promo)
        .append("</div>" * nest).append('\n')
      blk("div", promo, content = false)
    }

    // ---- page layout ------------------------------------------------------
    // head metadata plants: a page title, a self-canonical on some pages
    // (common CMS hygiene — must NOT create a canonical edge), and a
    // robots-noindex on a few (search-excluded pages a corpus builder drops
    // before extraction)
    val headTitle = "판례 포털 - " + pick(rng, titlePool)
    val selfCanon = rng.nextDouble() < 0.4
    val noindex = rng.nextDouble() < 0.05
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n")
      .append("<title>").append(headTitle).append("</title>\n")
    if (selfCanon)
      sb.append("<link rel=\"canonical\" href=\"").append(url(i)).append("\"/>\n")
    if (noindex)
      sb.append("<meta name=\"robots\" content=\"noindex, follow\"/>\n")
    // pagination plant: rel=prev/next head links on chain members (no rng)
    val cBase = chainBase(i, spec.docs.toLong)
    val cPos = if (cBase >= 0) (i - cBase).toInt else -1
    if (cBase >= 0) {
      if (cPos > 0)
        sb.append("<link rel=\"prev\" href=\"").append(url(i - 1)).append("\"/>\n")
      if (cPos < ChainLen - 1)
        sb.append("<link rel=\"next\" href=\"").append(url(i + 1)).append("\"/>\n")
    }
    // hreflang plant: the FULL alternate set (self included) on declaring
    // pages; one-sided clusters plant only on the base page (no rng)
    val aBase = altBase(i, spec.docs.toLong)
    if (aBase >= 0) {
      sb.append("<link rel=\"alternate\" hreflang=\"ko\" href=\"")
        .append(url(aBase)).append("\"/>\n")
        .append("<link rel=\"alternate\" hreflang=\"en\" href=\"")
        .append(url(aBase + 1)).append("\"/>\n")
    }
    // JSON-LD plant on fresh non-error pages (no rng; the soft-404 stride
    // matches the body plant below)
    val hasLd = i % 257 != 13
    if (hasLd) {
      sb.append("<script type=\"application/ld+json\">")
        .append("{\"@context\":\"https://schema.org\",\"@type\":\"NewsArticle\",")
        .append("\"headline\":\"").append(jsonEsc(headTitle)).append("\",")
        .append("\"datePublished\":\"").append(publishedDate(i)).append("\"}")
        .append("</script>\n")
    }
    sb.append("<style>body{margin:0} .x>a{color:#06c}</style>\n")
      .append("<script>if(1<2){document.x='<div>not markup</div>';}</script>\n")
      .append("</head>\n<body>\n")
      .append("<!-- page chrome: <p>commented markup is not content</p> -->\n")
      .append("<header class=\"site-header\"><img src=\"media/logo.png\"/>")
      .append("<h1>법률 정보 포털</h1>\n<nav>")
    // the logo precedes the <h1> boundary, so it flushes as an image-only
    // header block before the h1 text block
    blk("header", "", content = false, nMedia = 1)
    blk("h1", "법률 정보 포털", content = false)
    val navTexts = Vector.tabulate(4 + rng.nextInt(4)) { k =>
      val t = pick(rng, navPool)
      sb.append("<a href=\"/m").append(k).append("\">")
        .append(t).append("</a> ")
      plantLink(s"/m$k", t, fromContent = false)
      t
    }
    blk("nav", navTexts.mkString(" "), content = false)
    sb.append("</nav></header>\n<div class=\"content-wrap\">\n")
    // 0–2 extra wrapper divs shift the whole article's depth band together
    val wrap = rng.nextInt(3)
    sb.append("<main class=\"article-body\">\n").append("<div>" * wrap)

    // SOFT-404 PLANT: every 257th page is an error page served as a normal
    // page — full chrome (the draws above are shared), but the article is a
    // not-found notice instead of a judgment. Status-code filtering cannot
    // drop these; only content-shaped detection after boilerplate removal
    // can ([[MainContent.isSoftError]]). The notice paragraph carries the
    // page's own case number so two error pages never share a span
    // 2-shingle (same argument as the lead-paragraph uniqueness below).
    val soft404 = i % 257 == 13
    if (soft404) {
      sb.append("<h2>").append(MainContent.SoftErrorHeading).append("</h2>\n")
      plant(MainContent.KindHeading, MainContent.SoftErrorHeading)
      blk("h2", MainContent.SoftErrorHeading, content = true)
      val notice = s"요청하신 사건번호 2026가합${i}호 문서는 삭제되었거나 주소가 " +
        "변경되어 더 이상 제공되지 않습니다. 입력하신 주소가 정확한지 다시 한 번 " +
        "확인해 주시고, 포털의 판례 검색 기능을 이용하시거나 고객센터로 문의해 " +
        "주시기 바랍니다."
      sb.append("<p>").append(notice).append("</p>\n")
      plant(MainContent.KindText, notice)
      blk("p", notice, content = true)
    } else {

    val title = pick(rng, titlePool)
    sb.append("<h2>").append(title).append("</h2>\n")
    plant(MainContent.KindHeading, title)
    blk("h2", title, content = true)

    // the LEAD paragraph opens with the page's own case number (as real
    // judgments do) — a page-unique first sentence, so no two fresh pages
    // can share a (heading, lead) or (lead, second-paragraph) span
    // 2-shingle. Without this, pooled sentences make organic cross-page
    // near-dups a certainty at corpus scale (observed at sf1: two small
    // pages sharing heading + first two paragraphs reached 400‰), and the
    // planted-pair-equality gate stops being exact. With it, a chance pair
    // needs 4+ identical consecutive INTERIOR paragraphs — vanishing at
    // any corpus size.
    {
      // the rev-2 update is a constant suffix: no rng draw, so every page
      // that is NOT updated is byte-identical across crawl revisions
      val lead = s"사건번호 2026가합${i}호 사건의 판결 요지는 다음과 같다. " +
        pick(rng, sentencePool) + ". " + pick(rng, sentencePool) + "." +
        (if (rev >= 2 && i % Rev2ChangeStride == 5) Rev2UpdateNote else "")
      sb.append("<p>").append(esc(lead)).append("</p>\n")
      plant(MainContent.KindText, lead)
      blk("p", lead, content = true)
    }
    // SKEW PLANT: every 512th page is a mega-page (~100× the typical block
    // count) — the crawl's long-tail outlier (a forum dump, an archive
    // index). Row-wise parse cost is linear, so the extractor needs no
    // special path; what the plant pins is that correctness and task
    // balance hold when one row is 100× the median (the web analog of the
    // corpus's 5,000-page mega-doc).
    val mega = i % 512 == 511
    val extras = if (mega) 256 + rng.nextInt(64) else 2 + rng.nextInt(4)
    (0 until extras).foreach { _ =>
      rng.nextInt(6) match {
        case 0 => connector()
        case 1 => figure()
        case 2 => relatedBox()
        case 3 => linkFarm()
        case 4 => deepPromo()
        case _ => ()
      }
      paragraph() // every special is followed by a long paragraph
    }
    } // end of the non-soft-404 article body

    sb.append("</div>" * wrap).append("</main>\n")
      .append("<aside class=\"sidebar\"><h3>추천 서비스</h3><p>")
    val asidePromo = pick(rng, promoPool)
    sb.append(asidePromo).append("</p><ul>")
    blk("h3", "추천 서비스", content = false)
    blk("p", asidePromo, content = false)
    (0 until 3).foreach { _ =>
      val t = pick(rng, linkFarmPool)
      val nf = rng.nextDouble() < 0.5
      sb.append("<li><a href=\"#\"").append(if (nf) " rel=\"nofollow\"" else "")
        .append(">").append(t).append("</a></li>")
      plantLink("#", t, fromContent = false, nofollow = nf)
      blk("li", t, content = false)
    }
    sb.append("</ul></aside>\n</div>\n")
      .append("<footer><div class=\"copyright\">© 2026 법률 정보 포털 · ")
      .append("<a href=\"/terms\">이용약관</a> <a href=\"/privacy\">개인정보처리방침</a>")
      .append("</div></footer>\n")
    plantLink("/terms", "이용약관", fromContent = false)
    plantLink("/privacy", "개인정보처리방침", fromContent = false)
    blk("div", "© 2026 법률 정보 포털 · 이용약관 개인정보처리방침", content = false)
    // LONG-CHROME PLANT: on a third of fresh pages, a trailing SEO archive
    // farm — a body-level paragraph of pooled anchor texts whose non-space
    // mass is pushed past GoodLen. A pure length threshold (the naive-strip
    // baseline q_web_extract_eval measures) KEEPS it; the extractor drops
    // it on link density alone (>900‰ ≫ LinkPmMax — no bad class, no bad
    // ancestor, body depth inside the band), so the eval's false-positive
    // axis is non-degenerate by construction. Everything here draws rng
    // strictly AFTER every other draw on the page and appends after the
    // footer, so all previously planted bytes, spans, links and blocks are
    // untouched (the rev-2 byte-identity argument is preserved too: the
    // draws are rev-independent).
    if (i % 3 == 1) {
      sb.append("<div class=\"x\"><p>아카이브: ")
      val texts = ArrayBuffer.empty[String]
      while (texts.map(_.count(!_.isWhitespace)).sum < MainContent.GoodLen) {
        val t = pick(rng, linkFarmPool)
        val nf = rng.nextDouble() < 0.5
        sb.append("<a href=\"#\"")
          .append(if (nf) " rel=\"nofollow\"" else "")
          .append(">").append(t).append("</a> · ")
        plantLink("#", t, fromContent = false, nofollow = nf)
        texts += t
      }
      sb.append("</p></div>\n")
      blk("p", "아카이브: " + texts.map(_ + " ·").mkString(" "), content = false)
    }
    sb.append("</body>\n</html>\n")

    WebPage(id, sb.toString, truth.toVector, links.toVector,
      WebMeta(id, url(i), headTitle, noindex,
        if (selfCanon) url(i) else "", "", "", soft404,
        prev_url = if (cPos > 0) url(i - 1) else "",
        next_url = if (cBase >= 0 && cPos < ChainLen - 1) url(i + 1) else "",
        // one-sided clusters plant links but NO group truth: the engine's
        // reciprocity validation must reject them. The group id is the
        // lexicographically smallest member URL — the only canonical choice
        // an engine can compute from the declared set alone (consecutive ids
        // land on different portal hosts, so url(aBase) is NOT always it)
        alt_group =
          if (aBase >= 0 && !altOneSided(aBase))
            Seq(url(aBase), url(aBase + 1)).min
          else "",
        alt_lang =
          if (aBase >= 0 && !altOneSided(aBase)) (if (i == aBase) "ko" else "en")
          else "",
        published = if (hasLd) publishedDate(i) else ""),
      blks.toVector)
  }
}
