package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.parse.MainContent

/** Head-metadata enrichment over a raw crawl: pagination-chain stitching
  * (`rel="prev"/"next"`), reciprocity-validated hreflang alternate clusters,
  * and structured-data (`application/ld+json`) extraction. These are the
  * three head signals a corpus pipeline needs BEYOND title/robots/canonical
  * (already in `x_web_meta`): chains reassemble serialized articles into one
  * logical document before dedup counts them as near-dups, hreflang clusters
  * keep one language variant per group out of monolingual training mixes,
  * and ld+json is the only machine-readable publication date most news CMSes
  * expose (freshness mixing + recrawl scheduling both key on it).
  *
  * Reference anchor: the reference enriches each extraction with
  * page-level metadata before assembly (tasks.py:344–372 carries per-page
  * metadata through to the combined result); these ops are the web-crawl
  * restatement of that enrichment stage.
  *
  * Scale shape: ONE zero-shuffle `mapPartitions` parse emits every head
  * signal in a single pass over the raw markup (never re-lex per signal —
  * at 10¹² pages the lexer pass IS the cost); each downstream op then
  * touches only the tiny declaring subset (chain members and hreflang
  * declarers are strided plants here, and low-single-digit percentages on a
  * real crawl), so the joins below move KBs per million pages.
  */
object HeadMeta {

  /** One hreflang declaration: `<link rel="alternate" hreflang=lang href=href>`. */
  final case class AltLink(lang: String, href: String)

  /** Per-page parsed head metadata — everything [[MainContent.pageMeta]]
    * yields, flattened to Spark-friendly columns in one parse pass.
    */
  final case class HeadRow(doc_id: String, url: String, title: String,
                           noindex: Boolean, canonical: String,
                           prev_url: String, next_url: String,
                           alts: Seq[AltLink], ld: String)

  /** Parse `(doc_id, url, html)` pages to [[HeadRow]]s — zero shuffle, the
    * input's own partitioning (pages are independent; cluster upstream with
    * `repartitionByRange(doc_id)` exactly as the extraction surface does).
    */
  def parsed(pages: Dataset[(String, String, String)]): Dataset[HeadRow] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions(_.map { case (id, url, html) =>
      val m = MainContent.pageMeta(html)
      HeadRow(id, url, m.title, m.noindex, m.canonical, m.prev, m.next,
        m.alternates.map { case (l, h) => AltLink(l, h) }, m.ldJson)
    })
  }

  /** Stitch pagination chains: every page declaring `rel="prev"` or
    * `rel="next"` is a chain member; its head is the transitive `prev`
    * fixpoint and its position is the hop count to it. Chains of length L
    * settle in ceil(log2 L) pointer-doubling rounds
    * ([[Graph.resolvePointers]] — URL-keyed, so no id minting), not L
    * chain-walk rounds; `n_parts` is a per-head count over the member set
    * only. A `prev` target missing from the crawl still heads its chain
    * (the fixpoint is the furthest *reachable* predecessor) — partial
    * crawls degrade to partial chains, never to errors.
    *
    * Output: `(doc_id, head_url, pos, n_parts)` for chain members only.
    */
  def paginationChains(meta: DataFrame): DataFrame = {
    val members = meta
      .where(col("prev_url") =!= "" || col("next_url") =!= "")
      .select(col("doc_id"), col("url"), col("prev_url"))
    val edges = members.where(col("prev_url") =!= "")
      .select(col("url").as("src"), col("prev_url").as("dst"))
    val resolved = Graph.resolvePointers(members.select(col("url").as("doc_id")), edges)
      .select(col("doc_id").as("url"), col("final_id").as("head_url"),
        col("hops").as("pos"))
    val withId = members.select("doc_id", "url").join(resolved, Seq("url"))
    val lens = withId.groupBy(col("head_url"))
      .agg(count(lit(1)).cast("long").as("n_parts"))
    withId.join(lens, Seq("head_url"))
      .select(col("doc_id"), col("head_url"), col("pos"), col("n_parts"))
  }

  /** Reciprocity-validated hreflang clusters. A page's declaration is valid
    * iff (a) it references ITSELF (Google's self-reference requirement) and
    * (b) every referenced URL is a crawled page declaring the IDENTICAL
    * alternate set — set equality via an order-insensitive signature, so a
    * partner that declares a different/partial set (or nothing: the classic
    * one-sided deployment bug) invalidates the edge and the declarer drops
    * out. Valid members emit their cluster id — the lexicographically
    * smallest member URL, the only canonical choice computable from the
    * declared set alone — and their own language (the declared lang whose
    * href is the page itself).
    *
    * Plan: declarations are parsed once upstream; the signature is a pure
    * projection (sort + hash of the alt array), reciprocity is ONE
    * self-join on the exploded href list (each side only the declaring
    * subset), and validity is a per-page `min(ok)` rollup. No window, no
    * all-pairs: cost scales with declared edges, not pages².
    *
    * Output: `(doc_id, grp, lang)` for validated members only.
    */
  def hreflangClusters(meta: DataFrame): DataFrame = {
    val decl = meta.where(size(col("alts")) > 0)
      .select(col("doc_id"), col("url"), col("alts"))
      .withColumn("sig", md5(concat_ws("\n",
        array_sort(transform(col("alts"),
          a => concat(a("lang"), lit("|"), a("href")))))))
      .withColumn("self_ok",
        exists(col("alts"), a => a("href") === col("url")))
      .withColumn("grp", array_min(transform(col("alts"), a => a("href"))))
      .withColumn("lang", array_min(transform(
        filter(col("alts"), a => a("href") === col("url")), a => a("lang"))))
    val partners = decl.select(col("url").as("href"), col("sig").as("partner_sig"))
    val edgeOk = decl
      .select(col("doc_id"), col("sig"), explode(transform(col("alts"),
        a => a("href"))).as("href"))
      .join(partners, Seq("href"), "left")
      .groupBy(col("doc_id"))
      .agg(min(coalesce(col("partner_sig") === col("sig"), lit(false)))
        .as("reciprocal"))
    decl.join(edgeOk, Seq("doc_id"))
      .where(col("reciprocal") && col("self_ok") && col("lang").isNotNull)
      .select(col("doc_id"), col("grp"), col("lang"))
  }

  /** Reassemble stitched chains into LOGICAL documents: every member's
    * extracted spans, concatenated in (position, span-order) and re-numbered
    * densely under the chain's head URL — the one-document view dedup,
    * packing and context-window chunking must see (a 3-part serialized
    * article is ONE training document, not three near-dup fragments).
    *
    * Plan: spans join chains on doc_id (inner — the 10¹²-page corpus
    * contributes nothing unless it paginates), then ONE window partitioned
    * by head. The partition is a single logical chain — bounded by chain
    * length × spans/page, never by corpus size — so this is the rare window
    * that is scale-safe by construction.
    *
    * Output: `(head_url, kind, text, media_ref, ord)`.
    */
  def assembleChains(spans: DataFrame, chains: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("head_url")).orderBy(col("pos"), col("ord"))
    spans.join(chains.select("doc_id", "head_url", "pos"), Seq("doc_id"))
      .select(col("head_url"), col("kind"), col("text"), col("media_ref"),
        (row_number().over(w) - 1).cast("long").as("ord"))
  }

  /** One representative per validated hreflang cluster: the `preferred`
    * language's member when the cluster has one, else the lexicographically
    * smallest (lang, doc_id) — a total order, so the pick is deterministic
    * under any partitioning. This is the admission rule that keeps ONE
    * variant per translation group in a monolingual training mix; pure
    * per-group min over the (tiny) validated-member table, map-side
    * combined, no window.
    *
    * Output: `(grp, doc_id, lang)` — one row per cluster.
    */
  def pickLanguageRepresentative(clusters: DataFrame,
                                 preferred: String): DataFrame = {
    clusters
      .groupBy(col("grp"))
      .agg(min(struct(
        when(col("lang") === preferred, 0).otherwise(1).as("p"),
        col("lang"), col("doc_id"))).as("w"))
      .select(col("grp"), col("w")("doc_id").as("doc_id"),
        col("w")("lang").as("lang"))
  }

  /** The fields a corpus pipeline reads from a NewsArticle ld+json block. */
  private val LdSchema = StructType(Seq(
    StructField("@type", StringType),
    StructField("headline", StringType),
    StructField("datePublished", StringType)))

  /** Extract structured data from pages carrying an
    * `application/ld+json` block: type, headline, publication date. Pure
    * projection (`from_json` on the already-parsed payload — the raw-text
    * lexer isolated it; no second HTML pass); absent fields surface as
    * empty strings so the output is total over carriers. Pages without a
    * block emit nothing — scraped re-posts and error skins don't maintain
    * structured data, which is exactly why the signal is optional.
    *
    * Output: `(doc_id, ld_type, headline, published)` for carriers only.
    */
  def structuredData(meta: DataFrame): DataFrame = {
    meta.where(col("ld") =!= "")
      .withColumn("j", from_json(col("ld"), LdSchema))
      .select(col("doc_id"),
        coalesce(col("j")("@type"), lit("")).as("ld_type"),
        coalesce(col("j")("headline"), lit("")).as("headline"),
        coalesce(col("j")("datePublished"), lit("")).as("published"))
  }
}
