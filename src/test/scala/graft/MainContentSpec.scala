package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.MainContent
import graft.corpus.{CorpusGen, WebGen}

/** Vectors for the raw-HTML main-content extractor: every heuristic
  * (class-hint words, link density, depth band, context smoothing, media
  * linking, lexer robustness) pinned by hand-built pages, plus the planted-
  * truth round-trip over the deterministic wild-web generator.
  */
class MainContentSpec extends AnyFunSuite {

  private val longA =
    "법원이 인정하는 사실관계는 제출된 증거와 변론 전체의 취지를 종합한 결과이다. " +
    "계약 해석에 있어 당사자의 진정한 의사가 문언보다 우선한다는 것이 판례의 태도이다. " +
    "원고의 청구 중 일부는 이유 있으므로 인용하고 나머지 청구는 기각하기로 한다."
  private val longB =
    "손해배상의 범위는 통상손해를 원칙으로 하고 특별손해는 예견가능성이 있는 경우에 한한다. " +
    "당사자 사이에 다툼이 없는 사실과 증거에 의하여 인정되는 사실은 다음과 같다. " +
    "감정인의 감정 결과와 증인의 진술은 그 신빙성이 인정되어 사실 인정의 자료가 된다."

  private def texts(html: String): Seq[String] =
    MainContent.extract(html).filter(_.kind != MainContent.KindMedia).map(_.text)
  private def media(html: String): Seq[String] =
    MainContent.extract(html).filter(_.kind == MainContent.KindMedia).map(_.media_ref)

  test("semantic chrome and classed chrome drop; article text survives") {
    val html =
      s"""<body><nav><a href="/">홈</a> <a href="/a">판례</a></nav>
         |<div class="site-header"><h1>포털</h1></div>
         |<main><p>$longA</p><p>$longB</p></main>
         |<aside><p>$longA</p></aside>
         |<footer>© 2026 <a href="/t">약관</a></footer></body>""".stripMargin
    assert(texts(html) == Seq(longA, longB))
  }

  test("bad words match class/id WORDS, not substrings") {
    // 'header' inside 'site-header' flags; 'ad' inside 'reading-list' must not
    val flagged = s"""<div class="site-header"><p>$longA</p></div>"""
    assert(texts(flagged).isEmpty)
    val clean = s"""<div class="reading-list"><p>$longA</p></div>"""
    assert(texts(clean) == Seq(longA))
    val byId = s"""<div id="main_sidebar"><p>$longA</p></div>"""
    assert(texts(byId).isEmpty)
  }

  test("link density drops a link farm with no bad class") {
    val farm = (1 to 4).map(k => s"""<a href="#$k">대법원 판결 전문 자료 모음집 $k</a>""")
      .mkString("<p>추천: ", " · ", "</p>")
    val html = s"<body><p>$longA</p>$farm<p>$longB</p></body>"
    assert(texts(html) == Seq(longA, longB))
    // a short inline citation must NOT trip the same rule
    val cited = s"""<p>${longA.take(60)} <a href="/law">민법 제390조</a> ${longA.drop(60)}</p>"""
    assert(texts(s"<body>$cited</body>").size == 1)
  }

  test("depth band: long clean text far below the article drops, promotable lengths too") {
    val nest = "<div>" * (MainContent.DepthSlack + 2)
    val unnest = "</div>" * (MainContent.DepthSlack + 2)
    // NEAR-length deep text must not ride the smoothing rule either
    val nearLen = "지금 가입하시면 판례 전문 열람 서비스를 한 달간 무료로 이용하실 수 있습니다"
    val html = s"<body><main><p>$longA</p>$nest$nearLen$unnest<p>$longB</p></main></body>"
    assert(texts(html) == Seq(longA, longB))
    // but with NO shallow article, equally-deep text keeps itself
    val onlyDeep = s"<body>$nest<p>$longA</p>$unnest</body>"
    assert(texts(onlyDeep) == Seq(longA))
  }

  test("context smoothing: short kept between goods, dropped next to bad") {
    val short = "구체적 판단은 아래와 같다."
    val kept = s"<body><p>$longA</p><p>$short</p><p>$longB</p></body>"
    assert(texts(kept) == Seq(longA, short, longB))
    val farm = (1 to 5).map(k => s"""<a href="#$k">관련 판례 전문 보기 자료 $k</a>""")
      .mkString("<p>", " ", "</p>")
    val dropped = s"<body><p>$longA</p><p>$short</p>$farm</body>"
    assert(texts(dropped) == Seq(longA))
  }

  test("headline promotion: heading kept iff followed by good content") {
    val promoted = s"<body><h2>쟁점의 정리</h2><p>$longA</p></body>"
    assert(texts(promoted) == Seq("쟁점의 정리", longA))
    assert(MainContent.extract(promoted).head.kind == MainContent.KindHeading)
    val orphan = s"<body><p>$longA</p><h2>쟁점의 정리</h2></body>"
    assert(texts(orphan) == Seq(longA))
  }

  test("media linking: content figures kept in order, chrome images dropped") {
    val html =
      s"""<body><header><img src="media/logo.png"/></header>
         |<main><p>$longA</p>
         |<figure><img src="media/fig-1.png"/><figcaption>별지 1: 계약서 사본</figcaption></figure>
         |<p>$longB</p></main>
         |<footer><img src="media/badge.png"/></footer></body>""".stripMargin
    assert(media(html) == Seq("media/fig-1.png"))
    val spans = MainContent.extract(html)
    assert(spans.map(s => (s.kind, s.order)).zipWithIndex.forall { case ((_, o), i) => o == i })
    assert(spans.map(_.kind) ==
      Seq(MainContent.KindText, MainContent.KindMedia, MainContent.KindText,
        MainContent.KindText))
    // an image stranded among boilerplate has no good neighbor
    val stranded = s"""<body><nav><a href="/">홈</a></nav><div><img src="media/x.png"/></div></body>"""
    assert(media(stranded).isEmpty)
  }

  test("lexer: script/style bodies and comments are not content, '<' inside JS is not a tag") {
    val html =
      s"""<head><title>제목</title><style>p>a{color:red}</style>
         |<script>if(1<2){document.x='<p>ghost</p>';}</script></head>
         |<body><!-- <p>commented</p> --><p>$longA</p></body>""".stripMargin
    assert(texts(html) == Seq(longA))
  }

  test("entities decode in text and in planted truth") {
    val html = s"<body><p>$longA 갑 &amp; 을 &lt;주문&gt;&nbsp;&#44032;</p></body>"
    assert(texts(html) == Seq(s"$longA 갑 & 을 <주문> 가"))
  }

  test("wild HTML: unclosed <p> runs still segment as separate blocks") {
    val html = s"<body><p>$longA<p>$longB</body>"
    assert(texts(html) == Seq(longA, longB))
  }

  test("degenerate inputs") {
    assert(MainContent.extract("").isEmpty)
    assert(MainContent.extract("   \n\t ").isEmpty)
    assert(MainContent.extract("plain text no markup").isEmpty) // short, no good neighbor
    assert(MainContent.extract(s"<p>$longA</p>") == MainContent.extract(s"<P>$longA</P>"))
  }

  test("block features: link density per-mille, anchor-only block") {
    val bs = MainContent.blocks(
      """<body><p>가나다라 <a href="#">마바</a></p><p><a href="#">마바사아</a></p></body>""")
    assert(bs.size == 2)
    assert(bs(0).nonWs == 6 && bs(0).anchorNonWs == 2 && bs(0).linkPm == 333)
    assert(bs(1).linkPm == 1000)
  }

  test("outlinks: content vs chrome attribution, encounter order, anchor text normal form") {
    val html =
      s"""<body><nav><a href="/home">홈</a> <a href="/cases">판례  검색</a></nav>
         |<main><p>${longA.take(60)} <a href="/law/390">민법 &amp;
         |제390조</a> ${longA.drop(60)}</p></main>
         |<footer><a href="/terms">약관</a></footer></body>""".stripMargin
    val ls = MainContent.outlinks(html)
    assert(ls.map(_.href) == Seq("/home", "/cases", "/law/390", "/terms"))
    assert(ls.map(_.order) == Seq(0, 1, 2, 3))
    assert(ls.map(_.from_content) == Seq(false, false, true, false))
    // anchor text is entity-decoded and whitespace-collapsed (the newline
    // inside the citation anchor collapses to one space)
    assert(ls(2).text == "민법 & 제390조")
    assert(ls(1).text == "판례 검색")
  }

  test("outlinks: script/style anchors, named anchors, unclosed and empty-block anchors are not links") {
    val html =
      s"""<head><script>x='<a href="/ghost">g</a>'</script></head>
         |<body><p>$longA <a name="top">표시</a></p>
         |<div><a href="/bare"></a></div>
         |<p>$longB <a href="/open">열림""".stripMargin
    // /ghost is inside a raw-text script body; the named anchor has no
    // href; /bare's block has no content; /open never closes
    assert(MainContent.outlinks(html).isEmpty)
    // href quoting forms all parse
    val q = """<body><p>%s <a href=/u1>하나</a> <a href='/u2'>둘</a></p></body>"""
      .format(longA)
    assert(MainContent.outlinks(q).map(_.href) == Seq("/u1", "/u2"))
  }

  test("outlinks: nested anchors fold into the outer link; capture does not perturb extraction") {
    val html =
      s"""<body><p>$longA <a href="/outer">바깥 <a href="/inner">안쪽</a> 글</a></p></body>"""
    val ls = MainContent.outlinks(html)
    assert(ls.map(_.href) == Seq("/outer"))
    assert(ls.head.text == "바깥 안쪽 글")
    // the same page extracts identically to its anchor-free rendering rules
    assert(MainContent.extract(html).nonEmpty)
  }

  test("planted outlink truth round-trip: 300 pages incl. dup and mega reconstruct exactly") {
    val spec = CorpusGen.specFor("sf0.001")
    for (i <- (0L until 300L) ++ Seq(WebGen.DupStride - 1L, 511L)) {
      val p = WebGen.genPage(i, spec)
      val got = MainContent.outlinks(p.html)
      assert(got == p.links, s"doc $i: got ${got.size} links vs ${p.links.size}")
    }
    // the plant exercises both attributions
    val all = (0L until 300L).flatMap(i => WebGen.genPage(i, spec).links)
    assert(all.exists(_.from_content) && all.exists(!_.from_content))
    // dup pages plant chrome-only links
    assert(WebGen.genPage(WebGen.DupStride - 1L, spec).links.forall(!_.from_content))
  }

  test("planted block truth round-trip: 300 pages incl. dup, near and mega segment exactly") {
    val spec = CorpusGen.specFor("sf0.001")
    // DupStride-1 is the first re-post; scanning 3 strides guarantees at
    // least one NEAR variant among the re-posts hit below
    for (i <- (0L until 300L) ++ Seq(WebGen.DupStride - 1L,
        2L * WebGen.DupStride - 1L, 3L * WebGen.DupStride - 1L, 511L)) {
      val p = WebGen.genPage(i, spec)
      val bs = MainContent.blocks(p.html)
      val keep = MainContent.finalKeep(bs)
      val got = bs.indices.map(k =>
        WebGen.WebBlock(bs(k).tag, bs(k).text, keep(k), bs(k).media.size, k)).toVector
      assert(got == p.blocks, s"doc $i: got ${got.size} blocks vs ${p.blocks.size}\n" +
        got.zipAll(p.blocks, null, null).filter { case (a, b) => a != b }
          .take(3).mkString("\n"))
    }
    // the plant exercises chrome and content blocks, image-only blocks, and
    // every tag family the skins emit
    val all = (0L until 300L).flatMap(i => WebGen.genPage(i, spec).blocks)
    assert(all.exists(_.is_content) && all.exists(!_.is_content))
    assert(all.exists(b => b.text.isEmpty && b.n_media == 1))
    assert(Set("h1", "h2", "h3", "nav", "p", "div", "li", "figure",
      "figcaption", "footer").subsetOf(all.map(_.tag).toSet))
  }

  test("soft-404 plant: error pages flag, normal pages and re-posts classify exactly") {
    val spec = CorpusGen.specFor("sf0.001")
    // fresh error pages (i % 257 == 13) extract to exactly heading + notice
    // and flag; their immediate neighbors do not
    for (i <- Seq(13L, 270L, 527L)) {
      val p = WebGen.genPage(i, spec)
      assert(p.meta.soft404)
      assert(p.truth.size == 2 && MainContent.extract(p.html) == p.truth)
      assert(MainContent.isSoftError(MainContent.extract(p.html)), s"page $i")
      assert(!MainContent.isSoftError(MainContent.extract(
        WebGen.genPage(i + 1, spec).html)), s"page ${i + 1}")
    }
    // a re-post whose SOURCE is an error page inherits the flag and is
    // detected from its completely different chrome; k ≡ 107 (mod 257)
    // makes src = k*DupStride an error page
    val dup = WebGen.genPage(107L * WebGen.DupStride + WebGen.DupStride - 1, spec)
    assert(dup.meta.soft404 && dup.meta.dup_kind.nonEmpty)
    assert(MainContent.isSoftError(MainContent.extract(dup.html)))
    // flag counts line up with the arithmetic plant over a window
    val n = (0L until 1000L).count(WebGen.genPage(_, spec).meta.soft404)
    val expected = (0L until 1000L).count { i =>
      if (i % WebGen.DupStride == WebGen.DupStride - 1)
        (i - (WebGen.DupStride - 1)) % 257 == 13
      else i % 257 == 13
    }
    assert(n == expected && n > 0)
  }

  test("recrawl plant: rev-2 pages change exactly where planted, byte-identical elsewhere") {
    val spec = CorpusGen.specFor("sf0.001")
    for (i <- 0L until 300L) {
      val r1 = WebGen.genPage(i, spec, rev = 1)
      val r2 = WebGen.genPage(i, spec, rev = 2)
      if (WebGen.changedInRev2(i)) {
        assert(r1.html != r2.html && r1.truth != r2.truth, s"page $i should change")
        // the change survives extraction on both sides
        assert(MainContent.extract(r2.html) == r2.truth, s"page $i rev-2 extract")
      } else {
        assert(r1.html == r2.html, s"page $i must be byte-identical across revs")
      }
    }
    // a re-post changes iff its source changed: source 5 is 5 % 37 — find a
    // dup whose src index is ≡ 5 (mod 37): src = k*101 with k*101 % 37 == 5
    val k = (0L until 37L).find(k => (k * 101) % 37 == 5).get
    val dupIdx = k * WebGen.DupStride + WebGen.DupStride - 1
    assert(WebGen.changedInRev2(dupIdx))
    assert(WebGen.genPage(dupIdx, spec, rev = 1).truth !=
      WebGen.genPage(dupIdx, spec, rev = 2).truth)
    // soft-404 pages never change (they have no lead): 13 % 37 == 13, find
    // an error page index ≡ 5 (mod 37): i ≡ 13 (mod 257), i ≡ 5 (mod 37)
    val err = (0L until 257L * 37L)
      .find(i => i % 257 == 13 && i % 37 == 5).get
    assert(!WebGen.changedInRev2(err))
    assert(WebGen.genPage(err, spec, rev = 1).html ==
      WebGen.genPage(err, spec, rev = 2).html)
    // status arithmetic: removal wins over change; new ids are added
    val docs = 4000L // > 37*53, so a changed+removed collision exists below
    val both = (0L until docs).find(i =>
      i % WebGen.Rev2RemoveStride == 7 && WebGen.changedInRev2(i)).get
    assert(WebGen.rev2Status(both, docs) == "removed")
    assert(WebGen.rev2Status(docs + 1, docs) == "added")
  }

  test("planted-truth round-trip: 300 generated pages extract exactly") {
    val spec = CorpusGen.specFor("sf0.001")
    for (i <- 0L until 300L) {
      val p = WebGen.genPage(i, spec)
      val got = MainContent.extract(p.html)
      assert(got == p.truth, s"doc $i: got ${got.size} spans vs ${p.truth.size}")
    }
  }

  test("mega-page skew plant: the 100x outlier extracts exactly and is actually 100x") {
    val spec = CorpusGen.specFor("sf0.001")
    val mega = WebGen.genPage(511L, spec)
    val typicalSpans = (0L until 20L).map(WebGen.genPage(_, spec).truth.size).sum / 20
    assert(mega.truth.size > typicalSpans * 20,
      s"mega=${mega.truth.size} typical=$typicalSpans — plant not skewed enough")
    assert(MainContent.extract(mega.html) == mega.truth)
  }

  test("content-duplicate plant: invisible to raw-HTML hashing, exact after extraction") {
    val spec = CorpusGen.specFor("sf0.001")
    // scan re-post indices for one of each planted kind
    val dups = (0L until 40L).map(k => WebGen.genPage(k * WebGen.DupStride + WebGen.DupStride - 1, spec))
    assert(dups.exists(_.meta.dup_kind == "exact") && dups.exists(_.meta.dup_kind == "near"),
      "both duplicate kinds must appear across seeds")
    dups.foreach { dup =>
      val src = WebGen.genPage(dup.meta.dup_src.stripPrefix("web-").toLong, spec)
      assert(dup.html != src.html, "chrome must differ — raw hashing must miss the pair")
      assert(MainContent.extract(dup.html) == dup.truth,
        "the re-posted skin must extract to its planted spans")
      if (dup.meta.dup_kind == "exact")
        assert(dup.truth == src.truth, "exact re-post: main content identical")
      else {
        // near re-post: editor note prepended, trailing paragraph dropped —
        // exact content dedup must miss the pair, structure dedup must not
        assert(dup.truth != src.truth)
        assert(dup.truth.head.kind == MainContent.KindText &&
          !src.truth.exists(_.text == dup.truth.head.text),
          "near re-post leads with a note absent from the source")
        assert(dup.truth.tail.map(s => (s.kind, s.text, s.media_ref)) ==
          src.truth.take(dup.truth.length - 1).map(s => (s.kind, s.text, s.media_ref)),
          "near re-post body = a prefix of the source")
        // the bounded trim: at most 2 spans dropped, at least 4 kept —
        // or note-only (nothing dropped) — floors the pair Jaccard at 500‰
        val dropped = src.truth.length - (dup.truth.length - 1)
        assert(dropped >= 0 && dropped <= 2, s"trim out of bounds: $dropped")
        if (dropped > 0) assert(dup.truth.length - 1 >= 4)
      }
    }
    // both near variants appear, and every near note is page-unique
    val nears = dups.filter(_.meta.dup_kind == "near")
    val srcLen = (d: WebGen.WebPage) =>
      WebGen.genPage(d.meta.dup_src.stripPrefix("web-").toLong,
        CorpusGen.specFor("sf0.001")).truth.length
    assert(nears.exists(d => d.truth.length - 1 < srcLen(d)), "a trimmed near re-post appears")
    assert(nears.exists(d => d.truth.length - 1 == srcLen(d)), "a note-only near re-post appears")
    assert(nears.map(_.truth.head.text).distinct.size == nears.size,
      "near notes must be unique per re-post")
  }

  test("page metadata: title, robots-noindex, canonical parse from wild markup") {
    // token-list microsyntax: rel/content match whole tokens, any case,
    // comma- or space-separated; first title and first canonical win
    val html =
      """<head><title> 판례  &amp; 해설 </title><title>second</title>
        |<META NAME='ROBOTS' CONTENT='NOINDEX, follow'/>
        |<link rel="stylesheet" href="/css"/>
        |<link rel="canonical" href="https://a.example/1"/>
        |<link rel="canonical" href="https://a.example/2"/>
        |</head><body><p>x</p></body>""".stripMargin
    val m = MainContent.pageMeta(html)
    assert(m.title == "판례 & 해설")
    assert(m.noindex)
    assert(m.canonical == "https://a.example/1")
    // defaults; a robots meta whose content merely CONTAINS the letters is
    // not a directive; commented-out metadata is not markup
    val clean = MainContent.pageMeta(
      """<head><meta name="robots" content="noindexing-is-off"/>
        |<!-- <meta name="robots" content="noindex"/> -->
        |<!-- <link rel="canonical" href="/ghost"/> --></head>""".stripMargin)
    assert(clean == MainContent.PageMeta("", noindex = false, ""))
    // a non-robots meta mentioning "noindex" in its content is not a directive
    assert(!MainContent.pageMeta(
      """<meta name="description" content="noindex appears in prose"/>""").noindex)
  }

  test("page metadata: pagination links, hreflang alternates, ld+json from wild markup") {
    val html =
      """<head><title>t</title>
        |<link rel="PREVIOUS" href="/p0"/>
        |<link rel="prev" href="/ignored-second-prev"/>
        |<link rel="next" href="/p2"/>
        |<link rel="alternate" type="application/rss+xml" href="/feed"/>
        |<link rel="alternate" hreflang="KO" href="/ko"/>
        |<link rel="alternate" hreflang="en" href="/en"/>
        |<script>var x = '<div>not markup</div>'; if (1<2) {}</script>
        |<script type="application/ld+json">
        |{"@type":"NewsArticle","headline":"a<b","datePublished":"2026-01-02"}
        |</script>
        |<script type="application/ld+json">{"second":"ignored"}</script>
        |</head><body><p>x</p></body>""".stripMargin
    val m = MainContent.pageMeta(html)
    // HTML4 `previous` alias counts; first prev/next win
    assert(m.prev == "/p0" && m.next == "/p2")
    // only alternates CARRYING hreflang are language variants (the rss
    // alternate is a feed, not a page); langs lowercase, document order
    assert(m.alternates == Vector(("ko", "/ko"), ("en", "/en")))
    // the ld+json body is a RAW-TEXT script: '<' inside must not fabricate
    // tags, and the payload must surface verbatim (first block wins)
    assert(m.ldJson ==
      """{"@type":"NewsArticle","headline":"a<b","datePublished":"2026-01-02"}""")
    // a commented-out ld block is not markup; a plain script is not ld+json
    val none = MainContent.pageMeta(
      """<head><script>{"headline":"x"}</script>
        |<!-- <script type="application/ld+json">{"a":1}</script> --></head>""".stripMargin)
    assert(none.ldJson == "" && none.prev == "" && none.alternates.isEmpty)
    // raw-text bodies stay invisible to the block segmenter
    assert(!MainContent.blocks(html).exists(_.text.contains("NewsArticle")))
  }

  test("planted head-metadata truth round-trip: chains, alternates, ld+json") {
    val spec = CorpusGen.specFor("sf0.001")
    val pages = (0L until 300L).map(WebGen.genPage(_, spec))
    pages.foreach { p =>
      val i = p.doc_id.stripPrefix("web-").toLong
      val m = MainContent.pageMeta(p.html)
      assert(m.prev == p.meta.prev_url && m.next == p.meta.next_url,
        s"pagination mismatch for ${p.doc_id}")
      // declarations appear iff the plant says so (one-sided bases DO
      // declare even though their reciprocity-validated group truth is "")
      val declares = WebGen.altBase(i, spec.docs.toLong) >= 0
      assert(m.alternates.nonEmpty == declares, s"hreflang mismatch for ${p.doc_id}")
      if (declares) assert(m.alternates.map(_._1) == Vector("ko", "en"))
      // ld+json present iff the plant recorded a published date, and the
      // payload carries exactly that date
      assert((m.ldJson.nonEmpty, p.meta.published.nonEmpty) match {
        case (a, b) => a == b
      }, s"ld+json presence mismatch for ${p.doc_id}")
      if (p.meta.published.nonEmpty)
        assert(m.ldJson.contains("\"datePublished\":\"" + p.meta.published + "\""))
    }
    // non-degeneracy: every family appears, incl. the one-sided plant
    assert(pages.exists(_.meta.prev_url.nonEmpty) && pages.exists(_.meta.next_url.nonEmpty))
    assert(pages.exists(_.meta.alt_group.nonEmpty), "a validated cluster appears")
    val oneSided = pages.filter(p =>
      MainContent.pageMeta(p.html).alternates.nonEmpty && p.meta.alt_group.isEmpty)
    assert(oneSided.nonEmpty, "a one-sided (reciprocity-failing) declarer appears")
    assert(pages.exists(_.meta.published.isEmpty), "an ld-free page appears (soft-404)")
    // group id = lexicographic min of the declared hrefs, both members agree
    val grouped = pages.filter(_.meta.alt_group.nonEmpty)
      .groupBy(_.meta.alt_group).values
    grouped.foreach { g =>
      assert(g.size == 2 && g.map(_.meta.alt_lang).toSet == Set("ko", "en"))
      assert(g.head.meta.alt_group == g.map(_.meta.url).min)
    }
  }

  test("outlinks: rel=nofollow is token-matched per anchor") {
    val html =
      s"""<body><p>$longA <a href="/f" rel="nofollow noopener">하나</a>
         | <a href="/g" rel="noopener">둘</a> <a href="/h" rel="xnofollow">셋</a></p></body>""".stripMargin
    val ls = MainContent.outlinks(html)
    assert(ls.map(l => (l.href, l.nofollow)) ==
      Seq(("/f", true), ("/g", false), ("/h", false)))
  }

  test("planted metadata truth round-trip: 300 pages incl. dup and mega reconstruct exactly") {
    val spec = CorpusGen.specFor("sf0.001")
    val pages = ((0L until 300L) ++ Seq(WebGen.DupStride - 1L, 511L)).map(WebGen.genPage(_, spec))
    pages.foreach { p =>
      val m = MainContent.pageMeta(p.html)
      assert((m.title, m.noindex, m.canonical) ==
        (p.meta.title, p.meta.noindex, p.meta.canonical), s"meta mismatch for ${p.doc_id}")
    }
    // the plant exercises every metadata family across seeds
    assert(pages.exists(_.meta.noindex) && pages.exists(!_.meta.noindex))
    assert(pages.exists(p => p.meta.canonical.nonEmpty && p.meta.canonical == p.meta.url),
      "self-canonical fresh pages appear")
    assert(pages.exists(p => p.meta.canonical.nonEmpty && p.meta.canonical != p.meta.url),
      "cross-page canonical re-posts appear")
    assert(pages.flatMap(_.links).exists(_.nofollow) &&
      pages.flatMap(_.links).exists(!_.nofollow))
  }

  test("generator coverage: every heuristic family appears across seeds") {
    val spec = CorpusGen.specFor("sf0.001")
    val htmls = (0L until 100L).map(WebGen.genPage(_, spec).html)
    assert(htmls.exists(_.contains("class=\"related\"")))
    assert(htmls.exists(_.contains("추천: <a")))          // link farm
    assert(htmls.exists(_.contains("<div>" * (MainContent.DepthSlack + 2)))) // deep promo
    assert(htmls.exists(_.contains("<figure>")))
    assert(htmls.exists(_.contains("&amp;")))
    assert(htmls.forall(_.contains("<nav>")))
  }
}
