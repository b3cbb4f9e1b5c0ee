package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sitemaps
import graft.corpus.{Corpus, WebGen}

/** Sitemap parsing (tolerant scanner, entities, index vs urlset) and the
  * distributed reconcile against the planted closed form at sf0.001,
  * including the reachability and cross-host traps.
  */
class SitemapsSpec extends AnyFunSuite {

  private val messy =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
      |        xmlns:xhtml="http://www.w3.org/1999/xhtml">
      |  <url><loc>  https://h.example/a?x=1&amp;y=2  </loc>
      |    <changefreq>daily</changefreq>
      |    <lastmod>2025-03-04</lastmod><priority>0.5</priority></url>
      |  <url>
      |    <loc>https://h.example/b</loc>
      |  </url>
      |  <url><priority>0.1</priority></url>
      |</urlset>
      |""".stripMargin

  test("urlset scanner: whitespace, entities, optional lastmod, loc-less skipped") {
    val es = Sitemaps.parseUrlset(messy)
    assert(es.toSeq === Seq(
      ("https://h.example/a?x=1&y=2", "2025-03-04"),
      ("https://h.example/b", "")))
    assert(!Sitemaps.isIndex(messy))
  }

  test("index scanner and host/path splitting") {
    val idx =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://h.example/maps/a.xml</loc>
        |    <lastmod>2025-01-01</lastmod></sitemap>
        |  <sitemap><loc>https://h.example/maps/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemaps.isIndex(idx))
    assert(Sitemaps.parseIndex(idx).toSeq ===
      Seq("https://h.example/maps/a.xml", "https://h.example/maps/b.xml"))
    assert(Sitemaps.urlHost("https://H.Example/maps/a.xml") === "h.example")
    assert(Sitemaps.urlPath("https://h.example/maps/a.xml") === "/maps/a.xml")
    assert(Sitemaps.urlPath("https://h.example") === "/")
  }

  test("entity unescape decodes the five predefined entities, amp last") {
    assert(Sitemaps.unescape("a&amp;lt;b") === "a&lt;b") // no double decode
    assert(Sitemaps.unescape("&lt;&gt;&quot;&apos;&amp;") === "<>\"'&")
    assert(Sitemaps.unescape("plain") === "plain")
  }

  test("reconcile at sf0.001 matches the planted closed form; traps excluded") {
    val spark = SparkSessions.spark
    val sf = "sf0.001"
    val pages = spark.read.parquet(Corpus.ensureWeb(spark, sf)).select("url")
    val maps = spark.read.parquet(Corpus.ensureWebSitemaps(spark, sf))
    val got = Sitemaps.reconcile(pages, maps)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet

    // closed form, recomputed independently of both the generator's XML
    // rendering and the op: crawled ids 0..99; listed = ids not ending in
    // 3 plus the 9e8 frontier ids; lastmod = 2025-01-01 + id % 400
    val docs = WebGen.specFor(sf).docs.toLong
    def hostOf(u: String) = u.stripPrefix("https://").takeWhile(_ != '/')
    val crawled = (0L until docs).map(i => (WebGen.url(i), i)).toMap
    val frontier = WebGen.hosts.flatMap(h => WebGen.frontierIds(h).map { f =>
      val path = if (h == "repost-archive.example") s"/p/$f" else s"/case/$f"
      (s"https://$h$path", f)
    }).toMap
    val listed = crawled.filter { case (_, i) => i % 10 != 3 } ++ frontier
    val expected =
      (crawled.keySet ++ listed.keySet).map { u =>
        val status =
          if (crawled.contains(u) && listed.contains(u)) "both"
          else if (crawled.contains(u)) "orphan" else "frontier"
        val lm = listed.get(u).map(WebGen.sitemapLastmod).getOrElse("")
        (u, hostOf(u), status, lm)
      }
    assert(got === expected)

    // the planted traps, asserted explicitly: portal-6 page 33 stays an
    // orphan (the cross-host entry in portal-5's file must be dropped) and
    // nothing from the unreachable stale.xml surfaces
    assert(got.exists(r => r._1.endsWith("/case/33") && r._3 === "orphan"))
    assert(!got.exists(_._1 === "https://repost-archive.example/p/403"))
    val page3 = got.filter(_._1 === "https://portal-4.law.example/case/3")
    assert(page3.map(_._3) === Set("orphan")) // stale's cross-host row leaked nothing
  }
}
