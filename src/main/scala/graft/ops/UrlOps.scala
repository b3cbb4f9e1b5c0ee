package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web corpora — the normalization every crawl
  * pipeline runs before URL-keyed dedup, per-host capping, and domain
  * blocklists (the reference corpus model is interleaved web documents;
  * CCNet/RefinedWeb both key their dedup and filtering stages on
  * canonical URLs).
  *
  * Everything is built from `org.apache.spark.sql.functions` string/array
  * primitives (whole-stage codegen, zero shuffle) and is expressible
  * identically in DuckDB SQL, so the driver oracle checks it directly —
  * no golden parquet involved.
  *
  * Canonical form:
  *   1. fragment dropped;
  *   2. scheme and host lowercased;
  *   3. leading `www.` stripped from the host;
  *   4. default ports dropped (`:80` for http, `:443` for https), other
  *      ports kept;
  *   5. tracking query params dropped (`utm_*`, `fbclid`, `gclid`), the
  *      survivors byte-sorted and rejoined (param ORDER never
  *      distinguishes two URLs); a paramless query string drops its `?`.
  *
  * Registrable domain: a deliberately small embedded suffix table (co.uk,
  * ac.uk, org.uk, com.au, co.jp) selects last-3 labels, everything else
  * last-2 — the standard public-suffix-list discipline with the list
  * pluggable (at production scale the full PSL ships as this same array
  * literal, still broadcast-free).
  */
object UrlOps {

  /** Multi-part public suffixes that push the registrable domain to three
    * labels. Pluggable; kept tiny here, the full PSL is ~9k rows and still
    * fits an array literal.
    */
  val MultiTlds: Seq[String] = Seq("co.uk", "ac.uk", "org.uk", "com.au", "co.jp")

  private val Tracking = Seq("utm_", "fbclid", "gclid")

  /** Canonical URL + parsed parts as one struct column
    * (url_norm, scheme, host, domain).
    */
  def parse(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    val hostPort = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathQuery = substring(rest, length(hostPort) + 1, lit(1 << 30))
    val path = substring_index(pathQuery, "?", 1)
    val query = when(instr(pathQuery, "?") > 0,
      substring(pathQuery, length(path) + 2, lit(1 << 30))).otherwise(lit(""))

    val host0 = lower(substring_index(hostPort, ":", 1))
    val host = when(host0.startsWith("www."),
      substring(host0, lit(5), lit(1 << 30))).otherwise(host0)
    val port = when(instr(hostPort, ":") > 0,
      substring_index(hostPort, ":", -1)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !((scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"))

    val params = filter(split(query, "&"), p =>
      p =!= "" && !Tracking.map {
        case pre if pre.endsWith("_") => p.startsWith(pre)
        case exact => p.startsWith(exact + "=") || p === exact
      }.reduce(_ || _))
    val qn = array_join(array_sort(params), "&")

    val labels = split(host, "\\.")
    val nl = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val domain = when(nl >= 3 &&
        array_contains(array(MultiTlds.map(lit): _*), last2),
      concat_ws(".", element_at(labels, -3), last2))
      .when(nl >= 2, last2)
      .otherwise(host)

    val urlNorm = concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qn =!= "", concat(lit("?"), qn)).otherwise(lit("")))
    struct(urlNorm.as("url_norm"), scheme.as("scheme"), host.as("host"),
      domain.as("domain"))
  }

  /** Per-row canonicalization of a (doc_id, url) table — pure projection,
    * zero shuffle at any corpus size.
    */
  def urlProfile(docs: DataFrame, url: Column = col("url")): DataFrame =
    docs.select(col("doc_id"), parse(url).as("u"))
      .select(col("doc_id"), col("u.url_norm"), col("u.scheme"),
        col("u.host"), col("u.domain"))

  /** Registrable-domain rollup: docs and distinct hosts per domain — the
    * per-host/per-domain capping input. ONE map-side-combined shuffle on
    * domain; the two-phase distinct-host count is the standard expansion.
    */
  def domainStats(profile: DataFrame): DataFrame =
    profile.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"))

  /** Per-host politeness schedule — the fetch-slot assignment a crawl
    * frontier computes so no host sees more than `perSlot` requests per
    * scheduling slot (the crawl-side analog of robots crawl-delay; every
    * large-scale fetcher shards its frontier this way). Within a host,
    * fetch order is the md5 of the doc id — content-independent and
    * ingest-order-independent, so re-planning the frontier never reorders
    * a host's queue — and
    *
    *   slot = (seq − 1) div perSlot.
    *
    * Scale shape: ONE exchange partitioned by host for the row_number
    * window. Politeness makes a host's queue inherently sequential, so
    * per-host ranking is the semantics, not an artifact; the giant-host
    * partition is the same work a real frontier serializes anyway, and
    * hosts are the parallel unit. Returns (doc_id, host, seq, slot); the
    * max(slot) per host is the host's crawl horizon.
    */
  def crawlSchedule(profile: DataFrame, perSlot: Int = 4): DataFrame = {
    require(perSlot >= 1, s"perSlot must be >= 1, got $perSlot")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    profile.select(col("doc_id"), col("host"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("slot", expr(s"(seq - 1) div ${perSlot}L"))
  }

  /** Domain opt-out compliance (robots/meta opt-outs, publisher takedown
    * lists): flag every doc whose registrable domain is on the blocked
    * list. The list ships as an InSet literal (opt-out lists are
    * 10^3–10^6 domains — broadcast-sized by nature; swap to a broadcast
    * left-semi join above ~10^6) — pure projection, zero shuffle.
    * `WHERE opted_out = 0` is the compliant corpus.
    */
  def optOut(profile: DataFrame, blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "blockedDomains must be non-empty")
    profile.select(col("doc_id"), col("domain"),
      col("domain").isin(blockedDomains: _*).cast("long").as("opted_out"))
  }
}
