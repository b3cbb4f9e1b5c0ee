package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc
import java.nio.file.{Files, Paths}

/** WARC record source: render/read round trip and the exactly-once
  * split-ownership contract swept across split sizes down to a handful of
  * bytes (every record boundary, header byte and body byte becomes a range
  * edge somewhere in the sweep).
  */
class WarcSpec extends AnyFunSuite {

  // html payloads chosen to stress the reader: multi-byte UTF-8, a body
  // containing CRLFCRLF (must be SKIPPED by Content-Length, never scanned),
  // a body ENDING in CRLF (abuts the record separator — the partial-overlap
  // case a naive boundary matcher mishandles), and an empty-ish page
  private val pages = Seq(
    ("w-0", "https://a.example/0", "<html><body><p>판례 본문 첫 문서</p></body></html>"),
    ("w-1", "https://a.example/1", "<html>\r\n\r\n<p>body with a bare separator inside</p></html>"),
    ("w-2", "https://a.example/2", "<html><p>ends in CRLF</p></html>\r\n"),
    ("w-3", "https://a.example/3", "<html></html>"),
    ("w-4", "https://b.example/4", "<html><p>" + ("가나다라 " * 500) + "</p></html>"))

  private def writeArchive(dir: String): Long = {
    Files.createDirectories(Paths.get(dir))
    val f = Paths.get(dir, "crawl-00000.warc")
    val bytes = pages.flatMap { case (id, u, h) => Warc.renderRecord(id, u, h) }.toArray
    Files.write(f, bytes)
    bytes.length.toLong
  }

  test("round trip: whole-file read returns every record verbatim") {
    val spark = SparkSessions.spark
    val dir = Files.createTempDirectory("warc").toString
    writeArchive(dir)
    val got = Warc.readPages(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq === pages.sortBy(_._1))
  }

  test("split sweep: every split size yields the same records exactly once") {
    val spark = SparkSessions.spark
    val dir = Files.createTempDirectory("warc").toString
    val len = writeArchive(dir)
    val expected = pages.sortBy(_._1)
    // sizes chosen so range edges land inside headers, bodies, separators
    // and exactly on record starts at some point; 7 is smaller than any
    // record — most splits own zero records and must emit nothing
    for (split <- Seq(7L, 64L, 100L, 333L, 1024L, len / 2, len - 1, len, len + 999)) {
      val got = Warc.readPages(spark, dir, maxSplitBytes = split).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
      assert(got.toSeq === expected, s"split=$split")
    }
  }

  test("multiple archive files are all read") {
    val spark = SparkSessions.spark
    val dir = Files.createTempDirectory("warc").toString
    Files.createDirectories(Paths.get(dir))
    for ((p, k) <- pages.zipWithIndex)
      Files.write(Paths.get(dir, f"crawl-$k%05d.warc"),
        Warc.renderRecord(p._1, p._2, p._3))
    val got = Warc.readPages(spark, dir, maxSplitBytes = 128)
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq === pages.map(_._1).sorted)
  }

  test("malformed record fails loudly with its offset") {
    val spark = SparkSessions.spark
    val dir = Files.createTempDirectory("warc").toString
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "bad.warc"),
      "WARC/1.0\r\nWARC-Type: response\r\n\r\nnope".getBytes("ASCII"))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.readPages(spark, dir).collect()
    }
    assert(e.getMessage != null)
  }
}
