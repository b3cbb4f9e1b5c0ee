package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-derived citation extraction over a crawl.
  *
  * Web link graphs (x_web_outlinks, Graph.*) see only MARKUP edges — what
  * the publisher chose to hyperlink. Corpora cite each other in prose too:
  * a court decision quotes a docket number, a paper cites a DOI, a forum
  * post pastes an identifier. This op lifts those edges from the EXTRACTED
  * content (never from chrome: a case number inside a link farm or footer
  * is navigation, not citation — extraction-first is what makes the signal
  * usable), then resolves each citation against the crawl's own URL
  * registry, the same no-global-index discipline as q_web_canonical.
  *
  * The gate corpus plants docket numbers (`2026가합{id}호`) in every fresh
  * lead and soft-404 notice; re-posts carry their SOURCE's number, so the
  * planted truth contains both self-citations and cross-page edges, and
  * the oracle restates it from the planted span table with a single regex
  * — zero extractor or generator-branch knowledge.
  *
  * Scale shape: one zero-shuffle flatMap does extraction + pattern scan
  * per page (pages never shuffle; a matched identifier is ~16 bytes).
  * Dedup is a map-side-combined aggregate on (doc_id, cited); resolution
  * is an equi-join on the identifier against a projection of the crawl's
  * url column — both sides narrow, AQE free to broadcast at gate scale or
  * hash-shuffle at corpus scale.
  */
object Citations {

  /** Default identifier pattern: the gate corpus's docket numbers. One
    * capture group = the citation key. Each planted span carries at most
    * one identifier; the op still scans for ALL matches per span, so a
    * multi-citation span contributes every key it mentions.
    */
  val DocketPattern = "2026가합([0-9]+)호"

  /** (doc_id, cited) distinct edges lifted from extracted content spans. */
  def extractEdges(pages: DataFrame, pattern: String = DocketPattern): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val rx = pattern.r
    pages.select("doc_id", "html").as[(String, String)]
      .flatMap { case (id, html) =>
        graft.parse.MainContent.extract(html).iterator
          .filter(_.kind != graft.parse.MainContent.KindMedia)
          .flatMap(sp => rx.findAllMatchIn(sp.text).map(m => m.group(1).toLong))
          .map(c => (id, c))
      }
      .toDF("doc_id", "cited")
      .groupBy("doc_id", "cited").agg(count(lit(1)).as("mentions"))
  }

  /** Resolve citation keys against the crawl's own URL registry: the page
    * whose url path is `/case/{key}` IS the cited document. Unresolvable
    * keys keep their edge with an empty target (the citation analog of a
    * dangling link).
    */
  def resolve(edges: DataFrame, pages: DataFrame): DataFrame = {
    val targets = pages
      .select(col("doc_id").as("target_id"),
        regexp_extract(col("url"), "/case/([0-9]+)$", 1).as("key"))
      .where(col("key") =!= "")
      .select(col("key").cast("long").as("cited"), col("target_id"))
    edges.join(targets, Seq("cited"), "left")
      .select(col("doc_id"), col("cited"), col("mentions"),
        coalesce(col("target_id"), lit("")).as("target_id"),
        (col("target_id").isNotNull && col("target_id") === col("doc_id"))
          .as("self_cite"))
  }
}
