package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.plans.ExtractDocs

/** Large-scale golden-equality check: compares the custom-plan-node
  * extraction against the oracle-generated golden tables at any scale
  * (the CI suite gates sf0.001; the driver gates sf0.01 — this drives the
  * same equality at sf0.1 / sf1 / sf3).
  *
  * Usage: runMain graft.ScaleCheck <sf> — prints one PASS/FAIL line per
  * surface (spans, markdown, html) with mismatch counts; exit code 1 on any
  * mismatch.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = Corpus.ensure(spark, sf)
    Corpus.ensureGolden(spark, sf)
    val out = ExtractDocs.over(spark, path).persist()

    // symmetric difference counts — zero both ways means exact multiset
    // equality of the full surface
    def diff(actual: DataFrame, golden: DataFrame, name: String): Long = {
      val extra = actual.exceptAll(golden).count()
      val missing = golden.exceptAll(actual).count()
      val ok = extra == 0 && missing == 0
      println(s"[scalecheck] $name ${if (ok) "PASS" else "FAIL"} " +
        s"(rows=${golden.count()}, extra=$extra, missing=$missing)")
      extra + missing
    }

    var bad = 0L
    bad += diff(
      graft.pipeline.Extraction.explodeSpans(out),
      spark.read.parquet(Corpus.goldenSpansPath(sf)), s"$sf spans")
    bad += diff(
      out.select(col("doc_id"), col("markdown")),
      spark.read.parquet(Corpus.goldenMdPath(sf)), s"$sf markdown")
    bad += diff(
      out.select(col("doc_id"), col("html")),
      spark.read.parquet(Corpus.goldenHtmlPath(sf)), s"$sf html")

    // raw-HTML surface: main-content extraction vs the PLANTED generator
    // truth (independent of the extractor) at the same scale
    {
      import spark.implicits._
      val pages = spark.read.parquet(Corpus.ensureWeb(spark, sf))
        .select(col("doc_id").cast("string"), col("html")).as[(String, String)]
      val webOut = graft.pipeline.WebExtraction.explodeSpans(spark,
        graft.pipeline.WebExtraction.assemble(
          graft.pipeline.WebExtraction.parse(pages)))
      bad += diff(webOut,
        spark.read.parquet(Corpus.goldenWebPath(sf)), s"$sf web")

      // outlink surface: extracted links vs the PLANTED link truth
      Corpus.ensureWebLinks(spark, sf)
      val linkOut = pages.flatMap { case (id, html) =>
        graft.parse.MainContent.outlinks(html)
          .map(l => (id, l.href, l.text, l.from_content, l.nofollow, l.order))
      }.toDF("doc_id", "href", "text", "from_content", "nofollow", "ord")
      bad += diff(linkOut,
        spark.read.parquet(Corpus.goldenWebLinksPath(sf)), s"$sf web-links")

      // page-metadata surface: title / robots-noindex / canonical vs the
      // PLANTED metadata truth
      Corpus.ensureWebMeta(spark, sf)
      val metaOut = pages.map { case (id, html) =>
        val m = graft.parse.MainContent.pageMeta(html)
        (id, m.title, m.noindex, m.canonical)
      }.toDF("doc_id", "title", "noindex", "canonical")
      bad += diff(metaOut,
        spark.read.parquet(Corpus.goldenWebMetaPath(sf))
          .select("doc_id", "title", "noindex", "canonical"), s"$sf web-meta")

      // extract-then-near-dup surface: the recovered pair set vs the
      // PLANTED duplicate truth (exact + near re-posts) at the same scale
      val sigs = pages.map { case (id, html) =>
        val toks = graft.parse.MainContent.extract(html).map(sp =>
          java.lang.Long.toHexString(SparkEntry.fnv64Span(sp)))
        (id.stripPrefix("web-").toLong, toks.mkString(" "))
      }.toDF("doc_id", "text")
      val pairs = graft.ops.Dedup.ngramJaccardPairs(sigs, n = 2, minJaccardPm = 400)
        .select("a", "b")
      val plantedPairs = spark.read.parquet(Corpus.goldenWebMetaPath(sf))
        .where(col("dup_kind") =!= "")
        .select(expr("CAST(substr(dup_src, 5) AS BIGINT)").as("a"),
          expr("CAST(substr(doc_id, 5) AS BIGINT)").as("b"))
      bad += diff(pairs, plantedPairs, s"$sf web-near-dup")
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
