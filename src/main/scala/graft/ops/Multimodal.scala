package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.hashing.MurmurHash3

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batch feature extraction inside `mapPartitions`.
  *
  * The DECODE step is a clearly-marked deterministic STUB (no image/audio
  * codecs ship in this container); everything Spark-side — schema, binary
  * encoding, partition-sized batching, pooled-decoder lifecycle, feature
  * shape — is real and tested. The pooled-decoder pattern mirrors the
  * reference's per-worker model pooling (tasks.py:59–87).
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: String, media_ref: String, media_type: String,
      content: Array[Byte], width: Int, height: Int)

  final case class MediaFeatures(
      doc_id: String, media_ref: String, n_bytes: Int,
      content_h64: Long, embedding: Array[Float])

  val BatchSize = 32
  val EmbeddingDim = 16

  /** Deterministic synthetic payload for a media_ref (stands in for real
    * bytes; seeded so any subset regenerates identically).
    */
  def syntheticContent(mediaRef: String): Array[Byte] = {
    val seed = MurmurHash3.stringHash(mediaRef)
    val rng = new scala.util.Random(seed)
    val n = 256 + rng.nextInt(768)
    val bytes = new Array[Byte](n)
    rng.nextBytes(bytes)
    bytes
  }

  /** Materialize media records for every media-bearing span of the corpus. */
  def fromCorpus(spark: SparkSession, corpusPath: String): Dataset[MediaRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.parquet(corpusPath)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.media_ref") =!= "")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      .as[(String, String)]
      .map { case (doc, ref) =>
        val mt = if (ref.endsWith(".png")) "image/png" else "image/jpeg"
        MediaRecord(doc, ref, mt, syntheticContent(ref), 640, 480)
      }
  }

  /** A "decoder" held per partition (pooled, like the reference's per-worker
    * models). decode() is the STUB boundary: a real build would hand `bytes`
    * to an actual codec here; we derive a deterministic fake feature vector.
    */
  final class StubDecoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      // STUB: deterministic pseudo-features from content bytes — replace with
      // a real image/audio decode when codecs are available.
      val h = MurmurHash3.bytesHash(bytes)
      val rng = new scala.util.Random(h)
      Array.fill(EmbeddingDim)(rng.nextFloat())
    }
  }

  /** Media-asset reuse across the corpus — the content-addressed-storage
    * question every multimodal pipeline answers before fetching/decoding
    * anything: which media_refs recur, in how many documents and spans, and
    * which single doc anchors the canonical copy (min doc_id — a total
    * order). At corpus scale shared assets (logos, tracking pixels, stock
    * images) dominate span counts; deduping the FETCH+DECODE by media_ref
    * is the difference between decoding per span and decoding per asset.
    *
    * Scale shape: one hash exchange on media_ref carrying (doc_id, n_bytes)
    * metadata only — content bytes never shuffle; the distinct-doc count is
    * the standard two-phase distinct aggregate and everything else combines
    * map-side.
    */
  def mediaReuse(media: Dataset[MediaRecord]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    media.toDF()
      .select(col("doc_id"), col("media_ref"),
        length(col("content")).cast("long").as("n_bytes"))
      .groupBy(col("media_ref"))
      .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("n_spans"),
        min(col("n_bytes")).cast("long").as("n_bytes"),
        min(col("doc_id")).as("keep_doc"))
  }

  final case class FrameRow(
      doc_id: String, media_ref: String, n_frames: Int, frame_no: Int,
      frame_md5: String, pooled_micro: Long)

  /** Average-pool a float embedding into `outDim` buckets of integer
    * micro-unit SUMS (sums, not means, so the result is exact regardless of
    * bucket sizes): each float is rounded to micro-units first, then summed
    * — order-fixed, bit-stable on every JVM.
    */
  def resizePool(emb: Array[Float], outDim: Int): Array[Long] = {
    val out = new Array[Long](outDim)
    var i = 0
    while (i < emb.length) {
      out(i * outDim / emb.length) += math.round(emb(i).toDouble * 1e6d)
      i += 1
    }
    out
  }

  /** Video-style frame sampling over opaque binary payloads: treat the
    * content as consecutive `frameBytes` frames, take every `stride`-th one
    * up to `maxFrames`, decode each sampled frame with the pooled (per
    * partition) stub decoder and average-pool its features to a micro-unit
    * checksum — the decode → resize → sample chain of a multimodal training
    * pipeline with the Spark plumbing (iterator fan-out, pooled decoder,
    * bounded output per asset) real and the codec stubbed.
    *
    * Pure flatMap: zero shuffle at any corpus size; output is bounded at
    * `maxFrames` rows per asset no matter how large the payload.
    */
  def frameSample(media: Dataset[MediaRecord], frameBytes: Int = 64,
                  stride: Int = 2, maxFrames: Int = 8,
                  poolDim: Int = 4): Dataset[FrameRow] = {
    require(frameBytes > 0 && stride > 0 && maxFrames > 0 && poolDim > 0,
      "frameBytes, stride, maxFrames, poolDim must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder // pooled once per partition
      it.flatMap { m =>
        val total = m.content.length / frameBytes // full frames only
        (0 until total by stride).take(maxFrames).iterator.map { f =>
          val frame = java.util.Arrays.copyOfRange(
            m.content, f * frameBytes, (f + 1) * frameBytes)
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(frame).map("%02x".format(_)).mkString
          FrameRow(m.doc_id, m.media_ref, total, f, md5,
            resizePool(decoder.decode(frame), poolDim).sum)
        }
      }
    }
  }

  // ---- perceptual-hash near-duplicate detection ---------------------------

  /** 64-bit average hash (aHash — the blockhash/pHash family's exact-integer
    * member) over an opaque byte payload: the stream is split into 64
    * position cells, bit i is set iff cell i's mean byte value exceeds the
    * global mean. Means are compared by CROSS-MULTIPLICATION
    * (cellSum·n > total·cellCount), so the hash is pure integer arithmetic —
    * bit-identical everywhere, no float thresholds. Small payload edits move
    * one cell's sum by a few units and flip at most the borderline bits,
    * which is exactly the near-duplicate property Hamming banding needs.
    * On real decoded pixels this is the textbook aHash; here it runs on the
    * opaque payload bytes (the stub-decode discipline of this module).
    */
  def phash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = (bytes(i) & 0xff).toLong
      val c = (i.toLong * 64L / n).toInt
      sums(c) += v; cnts(c) += 1; total += v
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (cnts(b) > 0 && sums(b) * n > total * cnts(b)) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Deterministic near-duplicate plants for the phash gate: every asset
    * whose ref murmur-hashes into residue class 0 (mod `mod`) gains a copy
    * (`ref~p`) with `flips` payload bytes bumped by one — the "re-encoded /
    * slightly edited image" class a perceptual dedup must catch. Selection
    * is content-keyed (no ordering, no sampling), so any subset of the
    * corpus plants identically.
    */
  def perturbedAssets(media: Dataset[MediaRecord], flips: Int = 2,
                      mod: Int = 7): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media
      .filter((m: MediaRecord) =>
        math.floorMod(MurmurHash3.stringHash(m.media_ref), mod) == 0)
      .map { m =>
        val c = m.content.clone()
        var j = 0
        while (j < flips && c.length > 0) {
          val p = j * 31 % c.length
          c(p) = (c(p) + 1).toByte
          j += 1
        }
        m.copy(media_ref = m.media_ref + "~p", content = c)
      }
  }

  /** The multi-index band/key layout shared by [[phashNearDup]] and the
    * sequential oracle: `maxHamming + bandsPerKey` disjoint bit-bands of
    * `64 / m` bits, one bucket key per `bandsPerKey`-subset of bands
    * (lexicographic [[Seq.combinations]] order — comboId is the band
    * column). With r = bandsPerKey, ≤ maxHamming differing bits touch ≤
    * maxHamming bands, leaving ≥ r bands intact, so some r-subset matches
    * in BOTH hashes — recall is exact by pigeonhole at every r. Bits above
    * `m·width` are unbanded, which only ever helps recall (a difference
    * there touches no band).
    */
  private[graft] def bandCombos(maxHamming: Int, bandsPerKey: Int): Seq[(Int, Seq[Int])] = {
    val m = maxHamming + bandsPerKey
    (0 until m).combinations(bandsPerKey).toSeq.zipWithIndex
      .map { case (bs, id) => (id, bs.toSeq) }
  }

  /** Perceptual near-duplicate asset pairs: [[phash64]] at the scan (bytes
    * never survive the first projection), then the SimHash pigeonhole
    * discipline — `maxHamming + bandsPerKey` Hamming bands, pairs meet only
    * inside a shared bucket, hot buckets (> `maxBucket` assets) are dropped
    * and singleton buckets pruned before the self-join, exact `bit_count`
    * Hamming verify on the survivors. Output (a, b, hamming), a < b.
    *
    * `bandsPerKey` (r) is the CORPUS-SCALE dial. At r = 1 (the classic
    * banding) a bucket key is one `64/(h+1)`-bit slice — 512 distinct keys
    * per band at h = 6, so once the corpus passes ~512·maxBucket assets
    * EVERY bucket is hot regardless of duplication and the cap silently
    * drops all recall. Requiring r bands to match jointly widens the key to
    * `r·width` bits at a `C(h+r, r)`× banding cost (still 16-byte rows):
    * h = 6, r = 3 → 84 keys of 21 bits ≈ 1.8·10^8 effective buckets, which
    * keeps expected bucket population below a 10^4 cap out to ~10^12
    * assets — the op's actual target scale. Recall stays exact by the
    * pigeonhole argument on [[bandCombos]]; only bucket population (and
    * with it the cap's bite) changes.
    *
    * Scale shape: the only exchanged rows are (ref, 8-byte hash) and the
    * bucket keys; asset payloads stay in the scan stage.
    */
  def phashNearDup(media: Dataset[MediaRecord], maxHamming: Int = 6,
                   maxBucket: Int = 10000,
                   bandsPerKey: Int = 1): org.apache.spark.sql.DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 15,
      s"maxHamming must be in [1, 15] (got $maxHamming); dedupe exact copies by content hash first")
    require(bandsPerKey >= 1 && 64 / (maxHamming + bandsPerKey) >= 3,
      s"bandsPerKey must be >= 1 with bands of >= 3 bits (got $bandsPerKey at maxHamming=$maxHamming)")
    val m = maxHamming + bandsPerKey
    val width = 64 / m
    val mask = (1L << width) - 1
    import org.apache.spark.sql.functions._
    val spark = media.sparkSession
    import spark.implicits._
    // hash map-side; one narrow (ref, hash) exchange dedupes assets shared
    // across documents so each asset is banded once
    val hashed = media.map(m => (m.media_ref, phash64(m.content)))
      .toDF("ref", "ph").groupBy("ref").agg(min(col("ph")).as("ph"))
    // one struct per band combo, built from plan-time constants: key =
    // the r band slices concatenated low-to-high
    val comboStructs = bandCombos(maxHamming, bandsPerKey).map { case (id, bs) =>
      val key = bs.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftrightunsigned(col("ph"), b * width).bitwiseAND(lit(mask)),
          i * width)
      }.reduce(_ bitwiseOR _)
      struct(lit(id).as("band"), key.as("key"))
    }
    val banded = hashed
      .select(col("ref"), col("ph"),
        explode(array(comboStructs: _*)).as("bk"))
      .select(col("ref"), col("ph"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val keepK = banded.groupBy("band", "key").agg(count(lit(1)).as("m"))
      .where(col("m").between(2, maxBucket))
      .select("band", "key")
    val pruned = banded.join(keepK, Seq("band", "key"), "left_semi")
    val a = pruned.select(col("ref").as("a"), col("ph").as("ph_a"), col("band"), col("key"))
    val b = pruned.select(col("ref").as("b"), col("ph").as("ph_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Batched feature extraction: partition-local decoder, fixed-size batches
    * (the mapInPandas batch-shape analog for a JVM-only build).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder // pooled once per partition
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val emb = decoder.decode(m.content)
          val h64 = (MurmurHash3.bytesHash(m.content).toLong << 32) |
            (m.content.length.toLong & 0xffffffffL)
          MediaFeatures(m.doc_id, m.media_ref, m.content.length, h64, emb)
        }
      }
    }
  }
}
