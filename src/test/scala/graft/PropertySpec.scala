package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.model._
import graft.parse._

/** Property-based robustness: the parser must uphold its invariants on
  * ARBITRARY inputs (malformed payloads included) — failures become error
  * spans, never exceptions (SPEC.md §3.1), and ordering is always total.
  * (Plain ScalaCheck Gen with deterministic seeds — scalatestplus isn't in
  * the offline cache.)
  */
class PropertySpec extends AnyFunSuite with Matchers {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { a =>
        withClue(s"seed=$i value=$a: ")(f(a))
      }
    }

  private val genText: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf("제 1 조", "갑과 Z는", "2o23년", "소 장", "１２３", "a|b|c", ""),
    Gen.listOf(Gen.oneOf('가', '나', '을', 'Z', '1', 'o', ' ', '|', '\n', '.'))
      .map(_.mkString))

  private val genSpan: Gen[InSpan] = for {
    kind <- Gen.oneOf(Kind.PageBreak, Kind.PdfLine, Kind.PdfRegion,
      Kind.HtmlBlock, Kind.Media)
    text <- kind match {
      case Kind.PageBreak => Gen.chooseNum(1, 5).map(n => s"page:$n")
      case Kind.PdfLine => for {
        y <- Gen.chooseNum(0, 3500); x <- Gen.chooseNum(0, 2400)
        w <- Gen.chooseNum(1, 2000); h <- Gen.chooseNum(1, 80)
        d <- Gen.chooseNum(0, 1000); s <- Gen.chooseNum(0, 1000)
        c <- Gen.chooseNum(0, 1000); raw <- genText
      } yield s"$y|$x|$w|$h|$d|$s|$c|$raw"
      case Kind.PdfRegion => for {
        y <- Gen.chooseNum(0, 3000); x <- Gen.chooseNum(0, 2000)
        w <- Gen.chooseNum(10, 2000); h <- Gen.chooseNum(10, 800)
        b <- Gen.oneOf("0", "1"); c <- Gen.chooseNum(0, 1000); md <- genText
      } yield s"$y|$x|$w|$h|$b|$c|$md" // 7-field round-2 region payload
      case Kind.HtmlBlock => for {
        d <- Gen.chooseNum(0, 9); l <- Gen.chooseNum(0, 200); raw <- genText
      } yield s"$d|p|$l|$raw"
      case _ => genText
    }
    ref <- Gen.oneOf("", "media/x.png")
  } yield InSpan(kind, text, ref, 0)

  private val genDoc: Gen[Doc] = for {
    n <- Gen.chooseNum(0, 40)
    spans <- Gen.listOfN(n, genSpan)
  } yield Doc("doc-prop", spans.zipWithIndex.map { case (s, i) => s.copy(offset = i) })

  test("parseDoc never throws; order is always 0..n-1; kinds are output kinds") {
    val outKinds = Set(Kind.H1, Kind.H2, Kind.P, Kind.Table,
      Kind.InvisibleTable, Kind.Media, Kind.Error)
    forAll(genDoc) { doc =>
      val e = DocParser.parseDoc(doc)
      e.spans.map(_.order) shouldBe e.spans.indices
      e.spans.foreach(s => outKinds should contain(s.kind))
    }
  }

  test("parseDoc is deterministic and independent of span list order permutation by offset") {
    forAll(genDoc) { doc =>
      val shuffled = Doc(doc.doc_id, scala.util.Random.shuffle(doc.spans))
      DocParser.parseDoc(shuffled) shouldBe DocParser.parseDoc(doc)
    }
  }

  test("fixTypos: never throws, stable under whitespace normalization") {
    forAll(genText) { t =>
      val once = Typo.fixTypos(t)
      // whitespace is always collapsed: a second split/join changes nothing
      once.split(" ").filter(_.nonEmpty).mkString(" ") shouldBe once.replaceAll("^ | $", "")
    }
  }

  test("Tables.render is idempotent for typo-inert cells") {
    // cells restricted to lowercase letters: digit-o-digit chains like
    // "1o2o3" are non-idempotent under the (reference-faithful)
    // non-overlapping regex scan, so mixed alphanumerics are excluded
    forAll(Gen.listOf(Gen.listOf(Gen.alphaLowerStr).map(_.mkString("|")))
        .map(_.mkString("\n"))) { grid =>
      val once = Tables.render(grid)
      Tables.render(once) shouldBe once
    }
  }

  test("cdcChunksStr: lossless, bounded, and deterministic on arbitrary text") {
    forAll(genText) { t =>
      val chunks = graft.ops.TextOps.cdcChunksStr(t)
      chunks.mkString shouldBe t                       // exact reassembly
      chunks.foreach(_.length should be <= 256)        // force-cut bound
      chunks.foreach(_.nonEmpty shouldBe true)         // no empty chunks
      if (t.isEmpty) chunks.length shouldBe 0
      graft.ops.TextOps.cdcChunksStr(t).toSeq shouldBe chunks.toSeq
    }
  }

  test("phash64: deterministic, and single-byte bumps move few bits") {
    forAll(Gen.chooseNum(0, 10000), n = 100) { seed =>
      val rng = new scala.util.Random(seed)
      val bytes = Array.fill(256 + rng.nextInt(768))(rng.nextInt(256).toByte)
      val h = graft.ops.Multimodal.phash64(bytes)
      graft.ops.Multimodal.phash64(bytes.clone()) shouldBe h
      // bump without the 255→0 wrap (a wrap is a −255 edit, not a small one)
      val e = bytes.clone()
      e(0) = (if ((e(0) & 0xff) == 255) 254 else (e(0) & 0xff) + 1).toByte
      // one +1 byte bump can flip at most the borderline cells: tiny radius
      java.lang.Long.bitCount(h ^ graft.ops.Multimodal.phash64(e)) should be <= 8
    }
  }

  test("bm25TermMicro: monotone in tf, anti-monotone in df and dl") {
    forAll(for {
      tf <- Gen.chooseNum(1L, 50L); df <- Gen.chooseNum(1L, 400L)
      dl <- Gen.chooseNum(1L, 2000L)
    } yield (tf, df, dl), n = 100) { case (tf, df, dl) =>
      val n = 500L; val sum = 250000L
      def s(t: Long, d: Long, l: Long) =
        graft.ops.Retrieval.bm25TermMicro(t, d, l, n, sum, 1200, 750)
      s(tf + 1, df, dl) should be >= s(tf, df, dl)      // more hits, better
      s(tf, df + 1, dl) should be <= s(tf, df, dl)      // commoner term, worse
      s(tf, df, dl + 100) should be <= s(tf, df, dl)    // longer doc, worse
      s(tf, df, dl) should be >= 0L                     // non-negative idf variant
    }
  }

  test("streaming near-dup signature: insensitive to duplicate shingles, sensitive to content") {
    forAll(Gen.listOfN(12, Gen.alphaNumStr.suchThat(_.nonEmpty)), n = 100) { ws =>
      val t = ws.mkString(" ")
      val sig = graft.streaming.StreamingNearDup.sigOfText(t)
      // doubling the text repeats every shingle: k-min is set-semantics —
      // only the NEW boundary shingles can lower entries
      if (ws.size >= 3) {
        val sig2 = graft.streaming.StreamingNearDup.sigOfText(t + " " + t)
        sig.zip(sig2).foreach { case (a, b) => b should be <= a }
        graft.streaming.StreamingNearDup.sigOfText(t).toSeq shouldBe sig.toSeq
      } else sig.length shouldBe 0
    }
  }

  test("salted bucket merge == direct merge for arbitrary page orderings") {
    forAll(Gen.listOf(Gen.chooseNum(1, 200))) { pageNos =>
      val pages = pageNos.distinct.map(n =>
        PageResult(n, Seq(OutSpan(Kind.P, s"p$n", "", 0)), s"md$n", s"<p>p$n</p>",
          parseFailed = false, confPm = n % 1000))
      val direct = DocParser.assemble("d", pages)
      val shuffledIn = DocParser.assemble("d", scala.util.Random.shuffle(pages))
      shuffledIn shouldBe direct
    }
  }

  test("unigramWord: lossless concatenation, alphabet-complete never UNKs, bounded pieces") {
    val genVocab: Gen[Map[String, Long]] = for {
      chars <- Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd'))
      multis <- Gen.listOfN(6, for {
        l <- Gen.chooseNum(2, 4)
        s <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
        c <- Gen.chooseNum(1L, 1000L)
      } yield s -> c)
      base <- Gen.chooseNum(1L, 50L)
    } yield (chars.map(ch => ch.toString -> base) ++ multis).toMap
    val gen = for {
      v <- genVocab
      wlen <- Gen.chooseNum(0, 12)
      w <- Gen.listOfN(wlen, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    } yield (v, w)
    forAll(gen, n = 200) { case (vocab, w) =>
      val total = vocab.valuesIterator.sum
      val maxLen = vocab.keysIterator.map(_.length).max
      val pieces = graft.ops.TextOps.unigramWord(w, vocab, total, maxLen, "[UNK]")
      if (Set('a', 'b', 'c', 'd').map(_.toString).subsetOf(vocab.keySet)) {
        // every char segmentable → lossless and bounded
        pieces.mkString shouldBe w
        pieces.length should be <= w.length
        pieces.foreach(p => vocab should contain key p)
      }
      // deterministic
      graft.ops.TextOps.unigramWord(w, vocab, total, maxLen, "[UNK]") shouldBe pieces
    }
  }

  test("pageRank == sequential oracle on random graphs (dangling, multi-component, seeded)") {
    val spark = SparkSessions.spark
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 18)
      nE <- Gen.chooseNum(0, 40)
      edges <- Gen.listOfN(nE, for {
        s <- Gen.chooseNum(0, n - 1); d <- Gen.chooseNum(0, n - 1)
      } yield (s.toLong, d.toLong))
      seedMod <- Gen.chooseNum(0, 3) // 0 = uniform, else ids % seedMod == 0
      iters <- Gen.chooseNum(1, 3)
    } yield (n, edges.distinct.filter(e => e._1 != e._2), seedMod, iters)
    forAll(gen, n = 6) { case (n, edges, seedMod, iters) =>
      val nodes = (0L until n.toLong).toSeq
      val seeds = if (seedMod == 0) None else Some(nodes.filter(_ % seedMod == 0).toSet)
      val want = graft.oracle.OpsOracle.pageRankSeq(nodes, edges, iters = iters,
        seeds = seeds)
      val edf = if (edges.isEmpty)
        Seq.empty[(Long, Long)].toDF("src", "dst") else edges.toDF("src", "dst")
      val got = graft.ops.Graph.pageRank(nodes.toDF("doc_id"), edf, iters = iters,
          seeds = seeds.map(s => s.toSeq.toDF("doc_id")))
        .as[(Long, Long)].collect().toSeq.sorted
      got shouldBe want
    }
  }

  test("phrase automaton == brute-force positional count on random dictionaries") {
    val genTok = Gen.oneOf("a", "b", "c", "ab")
    val genPhrase = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genTok))
    val genCase = for {
      dict <- Gen.chooseNum(1, 5).flatMap(k => Gen.listOfN(k, genPhrase))
      toks <- Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, genTok))
    } yield (dict, toks)
    forAll(genCase, n = 300) { case (dict, toks) =>
      val ac = new graft.functions.PhraseAc(dict.map(_.toSeq))
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(t =>
          org.apache.spark.unsafe.types.UTF8String.fromString(t)).toArray[Any])
      // brute force: every dict entry (duplicates included) at every position
      val brute = dict.map { p =>
        (0 to toks.length - p.length).count(i => toks.slice(i, i + p.length) == p)
      }.sum.toLong
      ac.hits(arr) shouldBe brute
    }
  }

  test("MainContent.extract: total, deterministic, order-dense on arbitrary markup soup") {
    import graft.parse.MainContent
    // adversarial wild-web fragments: unclosed/mismatched tags, stray < > &,
    // comments and scripts with markup inside, deep nesting, entities,
    // nulls/controls — the crawl delivers all of these
    val frag: Gen[String] = Gen.oneOf(
      Gen.oneOf("<div>", "</div>", "<p>", "</p", "<a href='x'>", "<img src=",
        "<!-- <p>not a block</p>", "-->", "<script>if(a<b){}</script>",
        "<<<", ">>>", "&amp;", "&bogus;", "&#x27;", "<P CLASS=", "'>",
        " ", "<br/>", "</a>", "<table><tr><td>", "</html>"),
      Gen.alphaNumStr,
      Gen.oneOf("제1조 본문 내용이 길다 " * 8, "short", "", " \t\n"),
      Gen.chooseNum(1, 40).map(d => "<div>" * d))
    val genSoup: Gen[String] =
      Gen.listOfN(30, frag).map(_.mkString)
    forAll(genSoup, n = 300) { html =>
      val a = MainContent.extract(html) // must not throw
      val b = MainContent.extract(html)
      a shouldBe b // deterministic
      a.map(_.order) shouldBe a.indices.toVector // dense 0..n-1
      a.foreach { s =>
        Set(MainContent.KindHeading, MainContent.KindText,
          MainContent.KindMedia) should contain(s.kind)
        if (s.kind == MainContent.KindMedia) s.media_ref should not be empty
        else s.text should not be empty
      }
    }
  }

  test("MainContent.pageMeta: total and deterministic on arbitrary markup soup") {
    import graft.parse.MainContent
    // the same adversarial fragments as the extract property, plus the
    // head-metadata attack surface: half-open link/script tags, ld+json
    // with markup inside, hreflang in every quoting form
    val frag: Gen[String] = Gen.oneOf(
      Gen.oneOf("<div>", "</div>", "<title>", "</title>", "<link rel=",
        "canonical", "'prev'", "\"next\"", "href=", "<link rel=alternate ",
        "hreflang=ko ", "href='/x'>", "<script type=\"application/ld+json\">",
        "{\"a\":\"<div>\"}", "</script>", "<!-- <title>no</title>", "-->",
        "<meta name=robots content=noindex>", "<<<", "&amp;", " ", "/>", ">"),
      Gen.alphaNumStr,
      Gen.oneOf("제1조 본문", "", " \t\n"))
    val genSoup: Gen[String] = Gen.listOfN(30, frag).map(_.mkString)
    forAll(genSoup, n = 300) { html =>
      val a = MainContent.pageMeta(html) // must not throw
      a shouldBe MainContent.pageMeta(html) // deterministic
      // langs are lowercased; whatever parsed is internally consistent
      a.alternates.foreach { case (l, h) =>
        l shouldBe l.toLowerCase
        l should not be empty
        h should not be empty
      }
    }
  }

  test("pointer-doubling redirect resolution == naive chain walk on random acyclic maps") {
    val spark = SparkSessions.spark
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(8, 24)
      // dst strictly below src → acyclic by construction, like redirectEdges
      redirects <- Gen.sequence[List[Option[(Int, Int)]], Option[(Int, Int)]](
        (1 until n).toList.map { s =>
          Gen.option(Gen.chooseNum(0, s - 1).map(d => (s, d)))
        }).map(_.flatten)
    } yield (n, redirects)
    forAll(gen, n = 6) { case (n, redirects) =>
      val nodes = (0L until n.toLong).toDF("doc_id")
      val edf = if (redirects.isEmpty)
        Seq.empty[(Long, Long)].toDF("src", "dst")
      else redirects.map { case (s, d) => (s.toLong, d.toLong) }.toDF("src", "dst")
      val m = redirects.map { case (s, d) => s.toLong -> d.toLong }.toMap
      def walk(v: Long): (Long, Long) = {
        var c = v; var h = 0L
        while (m.contains(c)) { c = m(c); h += 1 }
        (c, h)
      }
      graft.ops.Graph.resolveRedirects(nodes, edf)
        .as[(Long, Long, Long)].collect()
        .foreach { case (v, f, h) => (f, h) shouldBe walk(v) }
    }
  }

  test("string-keyed resolvePointers == naive chain walk on random acyclic URL maps") {
    // the key-type-generic core behind pagination-chain stitching: same
    // fixpoint + hop contract as the numeric path, but joined on raw URLs
    val spark = SparkSessions.spark
    import spark.implicits._
    def u(i: Int) = s"https://h${i % 3}.example/p/$i"
    val gen = for {
      n <- Gen.chooseNum(8, 24)
      edges <- Gen.sequence[List[Option[(Int, Int)]], Option[(Int, Int)]](
        (1 until n).toList.map { s =>
          Gen.option(Gen.chooseNum(0, s - 1).map(d => (s, d)))
        }).map(_.flatten)
    } yield (n, edges)
    forAll(gen, n = 6) { case (n, edges) =>
      val nodes = (0 until n).map(u).toDF("doc_id")
      val edf = if (edges.isEmpty) Seq.empty[(String, String)].toDF("src", "dst")
        else edges.map { case (s, d) => (u(s), u(d)) }.toDF("src", "dst")
      val m = edges.map { case (s, d) => u(s) -> u(d) }.toMap
      def walk(v: String): (String, Long) = {
        var c = v; var h = 0L
        while (m.contains(c)) { c = m(c); h += 1 }
        (c, h)
      }
      graft.ops.Graph.resolvePointers(nodes, edf)
        .as[(String, String, Long)].collect()
        .foreach { case (v, f, h) => (f, h) shouldBe walk(v) }
    }
  }

  test("hreflangClusters == sequential validation on random declaration universes") {
    // reciprocity + self-reference restated sequentially: a declarer is
    // valid iff its own URL is in its declared set AND every declared href
    // is a page declaring the IDENTICAL (lang, href) multiset. Random
    // universes exercise what the planted corpus cannot: dangling hrefs,
    // partial overlaps, conflicting langs for one href, duplicate entries.
    val spark = SparkSessions.spark
    import spark.implicits._
    def u(i: Int) = s"https://h${i % 2}.example/a/$i"
    val genDecl = for {
      nPages <- Gen.chooseNum(4, 8)
      sets <- Gen.sequence[List[List[(String, String)]], List[(String, String)]](
        (0 until nPages).toList.map { _ =>
          Gen.chooseNum(0, 4).flatMap(k =>
            Gen.listOfN(k, for {
              lang <- Gen.oneOf("ko", "en", "ja")
              href <- Gen.chooseNum(0, nPages) // nPages itself = dangling
            } yield (lang, u(href))))
        })
    } yield (nPages, sets)
    forAll(genDecl, n = 6) { case (nPages, sets) =>
      val meta = (0 until nPages).map { i =>
        graft.ops.HeadMeta.HeadRow(s"d$i", u(i), "", noindex = false, "",
          "", "", sets(i).map { case (l, h) => graft.ops.HeadMeta.AltLink(l, h) }, "")
      }.toDF()
      val got = graft.ops.HeadMeta.hreflangClusters(meta)
        .as[(String, String, String)].collect().toSet
      // sequential restatement over the same multiset-signature contract
      val byUrl = (0 until nPages).map(i => u(i) -> sets(i).sorted).toMap
      val expect = (0 until nPages).flatMap { i =>
        val s = sets(i).sorted
        val urlI = u(i)
        val selfLangs = s.collect { case (l, h) if h == urlI => l }
        val valid = s.nonEmpty && selfLangs.nonEmpty &&
          s.forall { case (_, h) => byUrl.get(h).contains(s) }
        if (valid) Some((s"d$i", s.map(_._2).min, selfLangs.min)) else None
      }.toSet
      got shouldBe expect
    }
  }
}
