package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap discovery reconciliation over a crawl.
  *
  * A production crawler holds two URL sets that never quite agree: what it
  * CRAWLED and what publishers LIST in their sitemaps
  * (https://www.sitemaps.org/protocol.html). Reconciling them yields the
  * two discovery signals a corpus pipeline schedules on: listed-but-
  * uncrawled URLs are the frontier (fetch next), crawled-but-unlisted pages
  * are orphans (re-verify: delisted, expired, or reachable only by link).
  * The reference pipeline has no crawler, but its corpus-ingestion front
  * end (upload → extract; see SURVEY §2.1 folder scan) faces the same
  * committed-vs-available reconcile — this op is that operator restated at
  * web scale.
  *
  * Protocol semantics implemented:
  *  - a sitemap FILE is either a `<urlset>` of `<url>` entries or a
  *    `<sitemapindex>` referencing child sitemaps (one level — the protocol
  *    forbids nested indexes; an index child that turns out to be another
  *    index is ignored);
  *  - only files REACHABLE from the host's well-known root
  *    (`/sitemap.xml`) count: the root itself if it is a urlset, plus the
  *    children its index references. Stale uploaded files nothing
  *    references contribute nothing;
  *  - cross-host entries are invalid (a sitemap may only list URLs on its
  *    own host) and are dropped;
  *  - `<loc>` is required, `<lastmod>` optional; unknown entry children
  *    (`<changefreq>`, `<priority>`, extensions) are ignored; standard XML
  *    entity escapes in `<loc>` are decoded.
  *
  * Scale shape: the sitemaps table has a handful of rows per HOST but each
  * body carries O(pages-per-host) entries, so the exploded listed-URL table
  * is O(corpus) — NOT broadcastable. Each body is parsed ONCE (a flatMap on
  * the small row set fans out to entry rows), entries dedup with a groupBy
  * on url, and the reconcile is a full-outer shuffle join on url; the
  * aggregate and the join share the url key, so Catalyst reuses one
  * exchange, and AQE is free to size or skew-split the other. The index →
  * child resolution joins (host, path) against the same table — a
  * broadcast-sized side at any corpus size (rows ∝ hosts).
  */
object Sitemaps {

  /** Decode the five predefined XML entities (the protocol requires escaped
    * URLs in `<loc>`). Numeric references are out of scope for URL data.
    */
  def unescape(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** Whether a fetched body is a sitemap INDEX (vs a urlset). */
  def isIndex(xml: String): Boolean = xml.contains("<sitemapindex")

  /** Text of the first `<tag>` child inside `block`, or "" — a tolerant
    * scanner, not an XML parser: sitemap files in the wild carry arbitrary
    * whitespace, namespaces, and extension elements, and entries never
    * nest, so tag-text extraction is exact for this grammar.
    */
  private def childText(block: String, tag: String): String = {
    val open = block.indexOf("<" + tag + ">")
    if (open < 0) return ""
    val from = open + tag.length + 2
    val close = block.indexOf("</" + tag + ">", from)
    if (close < 0) "" else unescape(block.substring(from, close).trim)
  }

  /** All `<outer>` blocks of a body, passed through `f`, skipping blocks
    * with no `<loc>`.
    */
  private def blocks(xml: String, outer: String): Iterator[String] = {
    val openTag = "<" + outer + ">"
    val closeTag = "</" + outer + ">"
    Iterator.unfold(0) { pos =>
      val open = xml.indexOf(openTag, pos)
      if (open < 0) None
      else {
        val close = xml.indexOf(closeTag, open)
        if (close < 0) None
        else Some((xml.substring(open, close), close + closeTag.length))
      }
    }
  }

  /** (loc, lastmod) entries of a `<urlset>` body; lastmod "" when absent. */
  def parseUrlset(xml: String): Array[(String, String)] =
    blocks(xml, "url")
      .map(b => (childText(b, "loc"), childText(b, "lastmod")))
      .filter(_._1.nonEmpty)
      .toArray

  /** Child sitemap locations of a `<sitemapindex>` body. */
  def parseIndex(xml: String): Array[String] =
    blocks(xml, "sitemap").map(b => childText(b, "loc")).filter(_.nonEmpty).toArray

  /** Lowercased host of an absolute URL, "" if not absolute. */
  def urlHost(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) return ""
    val rest = url.substring(i + 3)
    val slash = rest.indexOf('/')
    (if (slash < 0) rest else rest.substring(0, slash)).toLowerCase
  }

  /** Path (with query) of an absolute URL, "/" when bare. */
  def urlPath(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) return url
    val rest = url.substring(i + 3)
    val slash = rest.indexOf('/')
    if (slash < 0) "/" else rest.substring(slash)
  }

  /** Reconcile a crawl (`url` column) against fetched sitemap bodies
    * (`host`, `path`, `xml`). Returns one row per URL on either side:
    * (url, host, status ∈ both|frontier|orphan, lastmod) — `frontier` =
    * listed but never crawled, `orphan` = crawled but listed nowhere;
    * lastmod is the sitemap's claim ("" for orphans or unstamped entries,
    * the MIN when a URL is listed twice, so re-listing can't reorder
    * output).
    */
  def reconcile(pages: DataFrame, sitemaps: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._

    val bodies = sitemaps.select("host", "path", "xml")
      .as[(String, String, String)]

    // reachability from each host's well-known root: the root body itself
    // (when a urlset) plus the urlset children its index references — child
    // refs must stay on-host, and a child that is itself an index is
    // ignored (the protocol forbids nesting)
    val roots = bodies.filter(_._2 == "/sitemap.xml")
    val rootSets = roots.filter(r => !isIndex(r._3))
    val childRefs = roots.filter(r => isIndex(r._3))
      .flatMap { case (h, _, xml) =>
        parseIndex(xml).iterator
          .filter(loc => urlHost(loc) == h)
          .map(loc => (h, urlPath(loc)))
      }.toDF("host", "path")
    val childSets = bodies.toDF("host", "path", "xml")
      .join(childRefs, Seq("host", "path"), "left_semi")
      .as[(String, String, String)]
      .filter(r => !isIndex(r._3))

    // parse each reachable body ONCE; drop cross-host entries (invalid per
    // protocol); dedup + min-lastmod in one url-keyed aggregate
    val listed = rootSets.union(childSets)
      .flatMap { case (h, _, xml) =>
        parseUrlset(xml).iterator
          .filter { case (loc, _) => urlHost(loc) == h }
          .map { case (loc, lm) => (loc, lm) }
      }.toDF("url", "lastmod")
      .groupBy("url").agg(min("lastmod").as("lastmod"))

    // full-outer shuffle join on url — both sides O(corpus); the aggregate
    // above already partitioned `listed` by url, so only the crawl side
    // exchanges here
    pages.select(col("url").as("crawled_url"))
      .join(listed.withColumnRenamed("url", "listed_url"),
        col("crawled_url") === col("listed_url"), "full_outer")
      .select(
        coalesce(col("crawled_url"), col("listed_url")).as("url"),
        when(col("crawled_url").isNotNull && col("listed_url").isNotNull, "both")
          .when(col("crawled_url").isNull, "frontier")
          .otherwise("orphan").as("status"),
        coalesce(col("lastmod"), lit("")).as("lastmod"))
      .withColumn("host", regexp_extract(col("url"), "^https://([^/]+)", 1))
      .select("url", "host", "status", "lastmod")
  }
}
