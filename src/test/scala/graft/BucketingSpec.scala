package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY §2.3 / builder scale guidance):
  * two tables bucketed+sorted on the join key join with ZERO exchanges —
  * the 100 TB pattern for repeated joins against the same key (e.g. span
  * output ⋈ per-doc metadata) where a broadcast is too large.
  */
class BucketingSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("bucketed tables join without any exchange; result matches plain join") {
    val base = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val docs = (0L until 1000L).map(i => (i, s"body-$i")).toDF("doc_id", "body")
    val meta = (0L until 1000L by 2).map(i => (i, i * 10)).toDF("doc_id", "pages")

    spark.sql("DROP TABLE IF EXISTS graft_docs_b")
    spark.sql("DROP TABLE IF EXISTS graft_meta_b")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$base/docs").saveAsTable("graft_docs_b")
    meta.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$base/meta").saveAsTable("graft_meta_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so only bucketing can avoid the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_docs_b")
        .join(spark.table("graft_meta_b"), Seq("doc_id"))
      joined.count() shouldBe 500L

      val plan = joined.queryExecution.executedPlan.toString
      plan.linesIterator.count(_.contains("Exchange")) shouldBe 0
      plan should include("SortMergeJoin")

      // same rows as the unbucketed join
      val plain = docs.join(meta, Seq("doc_id"))
      joined.exceptAll(plain).count() shouldBe 0L
      plain.exceptAll(joined).count() shouldBe 0L
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_docs_b")
      spark.sql("DROP TABLE IF EXISTS graft_meta_b")
    }
  }
}
