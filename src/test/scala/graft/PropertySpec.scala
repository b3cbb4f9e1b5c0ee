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
}
