package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.hashing.MurmurHash3

/** Deduplication operators for web-scale training corpora.
  *
  * Scale notes (100 TB framing): every variant is a shuffle-on-key plan with
  * map-side combine; the only quadratic step (candidate verification) is
  * confined to LSH/band buckets, never the full corpus. Stop-shingle capping
  * bounds inverted-index skew the same way AQE skew-split would.
  */
object Dedup {

  /** Exact dedup via content hash: one hash-shuffle, keeps lowest doc_id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("content_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))

  /** Distinct word n-gram shingle hashes per doc: (doc_id, shingle). */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    docs.select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))).as("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index.
    *
    * Plan: shingles → (stop-shingle cap: drop shingles shared by more than
    * `maxDf` docs — they carry no discriminative signal and create O(df^2)
    * pair blowup) → self-join per shingle → per-pair intersection counts →
    * jaccard against per-doc shingle counts. Only docs sharing at least one
    * rare shingle ever meet — no cross join.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJaccardPm: Int = 500,
                        maxDf: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = shingles(docs, n).cache()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))

    // one groupBy-shingle shuffle builds the inverted index posting lists;
    // the df cap ([2, maxDf]) and the per-shingle pair loop both run inside
    // the aggregated row — no two-sided self-join exchange
    val inter = sh.groupBy("shingle")
      .agg(collect_set(col("doc_id").cast("long")).as("ds"))
      .where(size(col("ds")).between(2, maxDf))
      .select(col("ds")).as[Seq[Long]]
      .flatMap { ds =>
        val sorted = ds.sorted
        for (i <- sorted.indices.iterator; j <- (i + 1) until sorted.length)
          yield (sorted(i), sorted(j))
      }
      .toDF("a", "b")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_inter"))

    inter
      .join(counts.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "n_a"), Seq("a"))
      .join(counts.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "n_b"), Seq("b"))
      .withColumn("jaccard_pm",
        floor(col("n_inter") * lit(1000) / (col("n_a") + col("n_b") - col("n_inter"))).cast("long"))
      .where(col("jaccard_pm") >= minJaccardPm)
      .select(col("a"), col("b"), col("n_inter"), col("n_a"), col("n_b"), col("jaccard_pm"))
  }

  // ---- MinHash + LSH ------------------------------------------------------

  /** Deterministic universal-hash family over a 64-bit shingle hash. */
  private def minhashSig(shingleHashes: Iterable[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val it = shingleHashes.iterator
    while (it.hasNext) {
      val h = it.next()
      var i = 0
      while (i < k) {
        // mix h with the function index via murmur-style finalization
        var x = h + 0x9e3779b97f4a7c15L * (i + 1)
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        if (x < sig(i)) sig(i) = x
        i += 1
      }
    }
    sig
  }

  /** MinHash+LSH near-dup candidate pairs, verified with exact Jaccard.
    * shingle → k-minhash signature → band buckets → bucket join → verify.
    */
  def minHashNearDup(docs: DataFrame, n: Int = 3, k: Int = 64, bands: Int = 16,
                     minJaccardPm: Int = 500): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands

    val sh = shingles(docs, n).cache()
    // signatures via Tungsten-native collect_list (map-side combined, no
    // RDD/Java-serialization round-trip), minhash fold in a typed map
    val buckets = sh.groupBy(col("doc_id").cast("long").as("doc_id"))
      .agg(collect_list(col("shingle")).as("shingles"))
      .as[(Long, Seq[Long])]
      .flatMap { case (doc, hs) =>
        val sig = minhashSig(hs, k)
        (0 until bands).iterator.map { b =>
          val band = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
          (b, MurmurHash3.arrayHash(band), doc)
        }
      }
      .toDF("band", "bucket", "doc_id")
    // pair docs sharing a band bucket; sorting makes (a, b) canonical
    // before the cross-bucket distinct. Bucket cardinality is small by
    // construction (near-dups only), so the local pair loop is bounded.
    val candidates = buckets.groupBy("band", "bucket")
      .agg(collect_set(col("doc_id")).as("ds"))
      .where(size(col("ds")) >= 2)
      .select(col("ds")).as[Seq[Long]]
      .flatMap { ds =>
        val sorted = ds.sorted
        for (i <- sorted.indices.iterator; j <- (i + 1) until sorted.length)
          yield (sorted(i), sorted(j))
      }
      .toDF("a", "b")
      .distinct()

    // verify candidates with exact jaccard over the shingle index
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val aSh = sh.toDF("a", "shingle")
    val bSh = sh.toDF("b", "shingle")
    val inter = candidates.join(aSh, Seq("a")).join(bSh, Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.toDF("a", "n_a"), Seq("a"))
      .join(counts.toDF("b", "n_b"), Seq("b"))
      .withColumn("jaccard_pm",
        floor(col("n_inter") * lit(1000) / (col("n_a") + col("n_b") - col("n_inter"))).cast("long"))
      .where(col("jaccard_pm") >= minJaccardPm)
      .select("a", "b", "jaccard_pm")
  }

  // ---- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens. */
  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    for (tok <- text.trim.split("\\s+") if tok.nonEmpty) {
      var h = MurmurHash3.stringHash(tok).toLong & 0xffffffffL
      h = h | (MurmurHash3.stringHash(tok, 0x5bd1e995).toLong << 32)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, using the
    * pigeonhole band trick: split 64 bits into (maxHamming+1) bands; any pair
    * within distance d shares at least one exact band → band-join, then
    * verify true Hamming distance. No cross join.
    */
  def simHashNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val banded = docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val sim = simhash64(t)
        (0 until nBands).map { b =>
          (id, sim, b, (sim >>> (b * width)) & ((1L << width) - 1))
        }
      }
      .toDF("doc_id", "sim", "band", "key")
    val a = banded.select(col("doc_id").as("a"), col("sim").as("sim_a"), col("band"), col("key"))
    val b = banded.select(col("doc_id").as("b"), col("sim").as("sim_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("sim_a"), col("sim_b")).distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }
}
