package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HeadMeta
import graft.ops.HeadMeta.{AltLink, HeadRow}

/** Engine-level gates for the head-metadata ops over hand-built adversarial
  * inputs — the corpus plant is well-formed by construction, so the cases a
  * real crawl throws (broken chains, one-sided hreflang, partner declaring a
  * DIFFERENT set, missing self-reference, ld+json with absent fields) are
  * pinned here; the planted-truth gates (`q_web_pagination`/`q_web_hreflang`
  * /`q_web_ldjson`) pin the well-formed path at corpus scale.
  */
class HeadMetaSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def row(id: String, url: String,
                  prev: String = "", next: String = "",
                  alts: Seq[AltLink] = Nil, ld: String = "") =
    HeadRow(id, url, title = "t-" + id, noindex = false, canonical = "",
      prev_url = prev, next_url = next, alts = alts, ld = ld)

  test("paginationChains: stitching, positions, lengths, broken chains") {
    val meta = Seq(
      // a complete 3-part chain
      row("a0", "u/a0", next = "u/a1"),
      row("a1", "u/a1", prev = "u/a0", next = "u/a2"),
      row("a2", "u/a2", prev = "u/a1"),
      // a member whose prev target was never crawled: it still heads a
      // (partial) chain at the furthest REACHABLE predecessor
      row("b1", "u/b1", prev = "u/b0-missing"),
      // a singleton page declares nothing and must not appear
      row("c", "u/c")).toDF()
    val got = HeadMeta.paginationChains(meta)
      .as[(String, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a0", "u/a0", 0L, 3L),
      ("a1", "u/a0", 1L, 3L),
      ("a2", "u/a0", 2L, 3L),
      ("b1", "u/b0-missing", 1L, 1L)))
  }

  test("hreflangClusters: reciprocity and self-reference are load-bearing") {
    val ok = Seq(AltLink("ko", "u/k"), AltLink("en", "u/e"))
    val meta = Seq(
      // a validated two-language cluster — identical sets, both self-refer
      row("k", "u/k", alts = ok),
      row("e", "u/e", alts = ok),
      // one-sided: the partner declares nothing — both drop (partner has
      // no declaration at all, declarer fails reciprocity)
      row("o1", "u/o1", alts = Seq(AltLink("ko", "u/o1"), AltLink("en", "u/o2"))),
      row("o2", "u/o2"),
      // mismatched sets: partner declares a DIFFERENT (superset) set
      row("m1", "u/m1", alts = Seq(AltLink("ko", "u/m1"), AltLink("en", "u/m2"))),
      row("m2", "u/m2", alts = Seq(AltLink("ko", "u/m1"), AltLink("en", "u/m2"),
        AltLink("ja", "u/m3"))),
      // mutual but NEITHER self-refers (each lists only the other):
      // sets differ, so reciprocity already rejects them
      row("s1", "u/s1", alts = Seq(AltLink("en", "u/s2"))),
      row("s2", "u/s2", alts = Seq(AltLink("ko", "u/s1"))),
      // self-reference isolated: x, y, z ALL declare the identical set
      // {u/x, u/z} — every referenced member reciprocates, so x and z
      // validate; y declares the same set but is NOT in it → y fails
      // self-reference alone and drops (its presence must not taint x/z)
      row("x", "u/x", alts = Seq(AltLink("ko", "u/x"), AltLink("en", "u/z"))),
      row("y", "u/y", alts = Seq(AltLink("ko", "u/x"), AltLink("en", "u/z"))),
      row("z", "u/z", alts = Seq(AltLink("ko", "u/x"), AltLink("en", "u/z")))
    ).toDF()
    val got = HeadMeta.hreflangClusters(meta)
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("e", "u/e", "en"), ("k", "u/e", "ko"),
      ("x", "u/x", "ko"), ("z", "u/x", "en")))
  }

  test("assembleChains: dense renumbering in (pos, ord), members only") {
    val chains = Seq(
      ("a0", "u/a0", 0L, 3L), ("a1", "u/a0", 1L, 3L), ("a2", "u/a0", 2L, 3L)
    ).toDF("doc_id", "head_url", "pos", "n_parts")
    val spans = Seq(
      // pages arrive with their OWN per-page span orders; a2 has one span,
      // a0 two, a1 two — and a non-member page must vanish
      ("a1", "text", "p3", "", 0L), ("a1", "media", "", "img:1", 1L),
      ("a0", "heading", "h", "", 0L), ("a0", "text", "p1", "", 1L),
      ("a2", "text", "p5", "", 0L),
      ("zz", "text", "not a member", "", 0L)
    ).toDF("doc_id", "kind", "text", "media_ref", "ord")
    val got = HeadMeta.assembleChains(spans, chains)
      .as[(String, String, String, String, Long)].collect().sortBy(_._5)
    assert(got.toSeq == Seq(
      ("u/a0", "heading", "h", "", 0L),
      ("u/a0", "text", "p1", "", 1L),
      ("u/a0", "text", "p3", "", 2L),
      ("u/a0", "media", "", "img:1", 3L),
      ("u/a0", "text", "p5", "", 4L)))
  }

  test("pickLanguageRepresentative: preferred first, lexicographic fallback") {
    val clusters = Seq(
      ("g1", "d-ko", "ko"), ("g1", "d-en", "en"),   // preferred present
      ("g2", "d-fr", "fr"), ("g2", "d-de", "de"),   // fallback: min lang
      ("g3", "d-b", "en"), ("g3", "d-a", "en")      // lang tie: min doc_id
    ).toDF("grp", "doc_id", "lang")
    val got = HeadMeta.pickLanguageRepresentative(clusters, preferred = "ko")
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("g1", "d-ko", "ko"), ("g2", "d-de", "de"), ("g3", "d-a", "en")))
  }

  test("structuredData: escape round-trip, absent fields, carriers only") {
    val meta = Seq(
      row("a", "u/a", ld =
        """{"@type":"NewsArticle","headline":"a\"b\\c","datePublished":"2026-01-02"}"""),
      row("b", "u/b", ld = """{"@type":"Recipe","headline":"only type+headline"}"""),
      row("c", "u/c") // no block → no row
    ).toDF()
    val got = HeadMeta.structuredData(meta)
      .as[(String, String, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a", "NewsArticle", "a\"b\\c", "2026-01-02"),
      ("b", "Recipe", "only type+headline", "")))
  }
}
