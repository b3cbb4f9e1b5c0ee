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
          .map(l => (id, l.href, l.text, l.from_content, l.order))
      }.toDF("doc_id", "href", "text", "from_content", "ord")
      bad += diff(linkOut,
        spark.read.parquet(Corpus.goldenWebLinksPath(sf)), s"$sf web-links")
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
