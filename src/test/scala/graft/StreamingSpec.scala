package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.model._
import graft.corpus.CorpusGen
import graft.oracle.Oracle
import graft.pipeline.TableIO
import graft.streaming.StreamingExtraction
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("AvailableNow streaming ingest over multiple files == golden, exactly-once") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val spec = CorpusGen.Spec(docs = 40, megaPages = 16)
    val all = CorpusGen.genAll(spec).toSeq
    // several input files → several micro-batches with maxFilesPerTrigger=2
    all.grouped(10).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk).coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/input/part-$i")
    }
    val inputGlob = s"$tmp/input/part-*"

    StreamingExtraction.ingestAvailableNow(
      spark, inputGlob, s"$tmp/out", s"$tmp/ckpt", "stream-run", maxFilesPerTrigger = 2)

    val committed = TableIO.readCommitted(spark, s"$tmp/out").get
    committed.groupBy("doc_id").count().filter($"count" > 1).count() shouldBe 0
    val got = committed.select($"doc_id", $"spans").as[(String, Seq[OutSpan])]
      .collect().toMap
    val golden = all.map(d => d.doc_id -> Oracle.golden(d).spans).toMap
    got.keySet shouldBe golden.keySet
    for ((id, g) <- golden) withClue(s"doc $id: ") { got(id) shouldBe g }

    // re-running the same AvailableNow query with the same checkpoint is a
    // no-op (source offsets committed) — still exactly-once
    StreamingExtraction.ingestAvailableNow(
      spark, inputGlob, s"$tmp/out", s"$tmp/ckpt", "stream-run2", maxFilesPerTrigger = 2)
    TableIO.readCommitted(spark, s"$tmp/out").get
      .groupBy("doc_id").count().filter($"count" > 1).count() shouldBe 0
  }
}
