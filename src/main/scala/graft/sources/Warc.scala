package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import scala.collection.mutable.ArrayBuffer

/** WARC-style crawl-archive source: the interchange format web corpora
  * actually ship in (Common Crawl publishes exactly this shape). Each
  * archive file is a concatenation of self-describing records —
  * `WARC/1.0` version line, named headers including `Content-Length`, a
  * CRLFCRLF-terminated header block, the content block (an HTTP response:
  * status line + headers + HTML body), and a CRLFCRLF record separator.
  *
  * The reader is RANGE-SPLITTABLE, the property that makes the format work
  * at corpus scale: a single archive (or a directory of them) is chopped
  * into byte-range splits of `maxSplitBytes` on the driver (metadata only —
  * one `listStatus`), and each task independently:
  *
  *  1. seeks to its range start and SYNCS to the first record boundary at
  *     or after it (scanning for the 14-byte separator+version marker
  *     `\r\n\r\nWARC/1.0\r\n`; range start 0 is itself a boundary);
  *  2. reads records sequentially — headers parsed, bodies skipped by
  *     `Content-Length`, never scanned — emitting every record whose FIRST
  *     byte lies inside the range;
  *  3. finishes the record that STARTS before the range end even when its
  *     body runs past it (the next task's sync skips that record), so every
  *     record is owned by exactly one task: no loss, no duplication, for
  *     any split size down to single-digit bytes (WarcSpec sweeps this).
  *
  * This is the TextInputFormat ownership discipline applied to a framed
  * binary format. The body-skip means split sync is the only scanning work;
  * a task reads ~its own range once, sequentially — the I/O pattern object
  * stores and HDFS serve at full bandwidth.
  *
  * Caveat (documented, not hidden): boundary sync assumes the 14-byte
  * marker does not occur inside a record BODY. Our generator's HTML never
  * contains it (HTML has no reason to carry a WARC version line behind a
  * double CRLF); production archives make the same property structural by
  * gzipping each record into its own member (Common Crawl) so member
  * boundaries, not byte scans, do the sync. The header PARSE still
  * validates the synced position — a malformed record fails loudly with
  * its file offset rather than emitting garbage.
  */
object Warc {

  /** One byte-range of one archive file; the unit of read parallelism. */
  final case class WarcSplit(path: String, start: Long, length: Long)

  private val Sep = "\r\n\r\n"
  private val Marker = (Sep + "WARC/1.0\r\n").getBytes(US_ASCII)
  private val VersionLine = "WARC/1.0"

  // ---- writing -------------------------------------------------------------

  /** Render one response record (ASCII WARC headers + an HTTP/1.1 response
    * envelope + the UTF-8 body + the record separator). The doc id rides in
    * `WARC-Record-ID` as `<urn:graft:DOC_ID>`, the crawl URL in
    * `WARC-Target-URI` — both recovered verbatim by the reader.
    */
  def renderRecord(docId: String, url: String, html: String): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(US_ASCII)
    val warc = (s"$VersionLine\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:$docId>\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(US_ASCII)
    val out = new Array[Byte](warc.length + http.length + body.length + 4)
    System.arraycopy(warc, 0, out, 0, warc.length)
    System.arraycopy(http, 0, out, warc.length, http.length)
    System.arraycopy(body, 0, out, warc.length + http.length, body.length)
    System.arraycopy(Sep.getBytes(US_ASCII), 0, out, out.length - 4, 4)
    out
  }

  // ---- split planning (driver, metadata only) -------------------------------

  def planSplits(spark: SparkSession, dir: String, maxSplitBytes: Long): Seq[WarcSplit] = {
    require(maxSplitBytes > 0, "maxSplitBytes must be positive")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".warc"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val len = st.getLen
        (0L until len by maxSplitBytes).map(off =>
          WarcSplit(st.getPath.toString, off, math.min(maxSplitBytes, len - off)))
      }.toSeq
  }

  /** Read every record under `dir` into (doc_id, url, html), one task per
    * byte-range split. `maxSplitBytes` plays the role
    * `spark.sql.files.maxPartitionBytes` plays for parquet: size it so a
    * wave of splits covers the cluster (the driver-contract gate uses a
    * small value so even sf0.01 exercises dozens of mid-record boundaries).
    */
  def readPages(spark: SparkSession, dir: String,
                maxSplitBytes: Long = 32L << 20): DataFrame = {
    import spark.implicits._
    val splits = planSplits(spark, dir, maxSplitBytes)
    spark.createDataset(splits)
      .repartition(math.max(splits.size, 1)) // one split per task, the Hadoop norm
      .flatMap(readSplit)
      .toDF("doc_id", "url", "html")
  }

  // ---- the range reader ------------------------------------------------------

  /** Buffered sequential byte cursor over an FSDataInputStream with an
    * absolute-position counter (the ownership rule is positional).
    */
  private final class Cursor(in: FSDataInputStream, startAt: Long) {
    var pos: Long = startAt
    private val buf = new Array[Byte](64 * 1024)
    private var bLen = 0
    private var bOff = 0
    def read(): Int = {
      if (bOff == bLen) {
        bLen = in.read(buf); bOff = 0
        if (bLen <= 0) return -1
      }
      pos += 1; val b = buf(bOff) & 0xff; bOff += 1; b
    }
    /** CRLF-terminated ASCII line, terminator stripped; null at EOF. */
    def readLine(): String = {
      val sb = new java.lang.StringBuilder(64)
      var prev = -1
      var b = read()
      if (b < 0) return null
      while (b >= 0 && !(prev == '\r' && b == '\n')) {
        sb.append(b.toChar); prev = b; b = read()
      }
      if (b < 0) sb.toString
      else { sb.setLength(sb.length - 1); sb.toString } // drop the '\r'
    }
    def readFully(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val b = read()
        if (b < 0) throw new IllegalStateException(
          s"EOF inside a record body at pos $pos ($i/$n bytes)")
        out(i) = b.toByte; i += 1
      }
      out
    }
  }

  /** Emit every record whose first byte lies in [split.start, split.end). */
  def readSplit(sp: WarcSplit): Iterator[(String, String, String)] = {
    val path = new Path(sp.path)
    val fs = path.getFileSystem(new Configuration())
    val end = sp.start + sp.length
    val in = fs.open(path)
    try {
      val out = ArrayBuffer.empty[(String, String, String)]
      val scanFrom = math.max(0L, sp.start - 4)
      in.seek(scanFrom)
      val cur = new Cursor(in, scanFrom)
      // sync: position the cursor just past a version line whose record
      // start ('W') is >= sp.start and < end; rolling 14-byte marker match
      var recStart = -1L
      if (sp.start == 0) {
        val v = cur.readLine()
        if (v != null && v == VersionLine) recStart = 0
      } else {
        // circular window over the last |Marker| bytes, compared in full
        // whenever the newest byte could close a match — immune to the
        // partial-overlap restarts a naive single-index matcher mishandles
        // (e.g. a body ending in CRLF directly abutting the separator)
        val m = Marker
        val win = new Array[Int](m.length)
        var idx = 0
        var seen = 0L
        var stop = false
        var b = cur.read()
        while (b >= 0 && recStart < 0 && !stop && cur.pos < end + m.length) {
          win(idx) = b; idx = (idx + 1) % m.length; seen += 1
          if (seen >= m.length && b == (m(m.length - 1) & 0xff)) {
            var k = 0
            while (k < m.length && win((idx + k) % m.length) == (m(k) & 0xff)) k += 1
            if (k == m.length) {
              val p = cur.pos - 10 // 'W' of the version line just consumed
              if (p >= sp.start && p < end) recStart = p
              else if (p >= end) stop = true // next split's record
            }
          }
          if (recStart < 0 && !stop) b = cur.read()
        }
      }
      while (recStart >= 0 && recStart < end) {
        // WARC header block (version line already consumed)
        var id: String = null; var uri: String = null; var clen = -1L
        var line = cur.readLine()
        var guard = 0
        while (line != null && line.nonEmpty) {
          val c = line.indexOf(':')
          if (c > 0) {
            val k = line.substring(0, c).trim.toLowerCase
            val v = line.substring(c + 1).trim
            k match {
              case "warc-record-id" =>
                id = v.stripPrefix("<urn:graft:").stripSuffix(">")
              case "warc-target-uri" => uri = v
              case "content-length" => clen = v.toLong
              case _ => ()
            }
          }
          guard += 1
          if (guard > 64) throw new IllegalStateException(
            s"unterminated WARC header block at ${sp.path}:$recStart")
          line = cur.readLine()
        }
        if (id == null || uri == null || clen < 0) throw new IllegalStateException(
          s"malformed WARC record at ${sp.path}:$recStart (id=$id uri=$uri len=$clen)")
        val content = cur.readFully(clen.toInt)
        // HTTP envelope: body begins after the first CRLFCRLF
        var split = -1
        var i = 0
        while (split < 0 && i + 3 < content.length) {
          if (content(i) == '\r' && content(i + 1) == '\n' &&
              content(i + 2) == '\r' && content(i + 3) == '\n') split = i + 4
          i += 1
        }
        if (split < 0) throw new IllegalStateException(
          s"no HTTP header terminator in record at ${sp.path}:$recStart")
        out += ((id, uri, new String(content, split, content.length - split, UTF_8)))
        cur.readFully(4) // record separator
        recStart = cur.pos
        if (recStart < end) {
          val v = cur.readLine()
          if (v == null) recStart = -1 // clean EOF after the last record
          else if (v != VersionLine) throw new IllegalStateException(
            s"expected version line at ${sp.path}:$recStart, got '$v'")
        }
      }
      out.iterator
    } finally in.close()
  }
}
