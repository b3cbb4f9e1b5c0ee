package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.corpus.Corpus
import graft.pipeline.Extraction
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the scale properties the architecture claims
  * must be visible in `.explain` (SURVEY.md §4) — pushdown/pruning at the
  * scan, bounded exchange count, no extra shuffle sneaking in.
  */
class PlanSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSessions.spark

  private lazy val corpusPath = Corpus.ensure(spark, "sf0.001")

  test("comparator-style scan prunes columns and pushes filters to parquet") {
    val df = spark.read.parquet(corpusPath)
      .filter(col("doc_id") === "doc-000000042")
      .select("doc_id")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,doc-000000042)]")
    plan should include("ReadSchema: struct<doc_id:string>")
  }

  test("extraction plan has exactly the three intended exchanges") {
    val plan = Extraction.run(spark, corpusPath).queryExecution.executedPlan
    // 1: hash page fan-out, 2: partial (doc_id, salt) agg, 3: final doc agg
    val exchanges = plan.toString.linesIterator.count(_.contains("Exchange"))
    exchanges shouldBe 3
  }

  test("unsalted assembly saves one exchange (two total)") {
    val parsed = Extraction.parsePages(Extraction.readInput(spark, corpusPath), 4)
    val plan = Extraction.assemble(parsed, salted = false).queryExecution.executedPlan
    plan.toString.linesIterator.count(_.contains("Exchange")) shouldBe 2
  }

  test("assembly aggregates are partial+final hash aggregates (map-side combine)") {
    val plan = Extraction.run(spark, corpusPath).queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate") // collect_list path
  }
}
