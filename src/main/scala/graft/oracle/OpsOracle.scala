package graft.oracle

import graft.ops.{Dedup, Similarity, Multimodal}
import graft.corpus.{Corpus, CorpusGen}
import org.apache.spark.sql.{SparkSession, SaveMode}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import scala.util.hashing.MurmurHash3
import java.nio.file.{Files, Paths} // harness-exempt: golden-cache existence probes on the repo-local data/ dir (sequential oracle fixture, not a production path)

/** Sequential, single-threaded ground truths for the dedup / similarity /
  * ANN / multimodal operators (VERDICT round 1 item 1: every driver query
  * needs a DuckDB-checkable oracle; for non-SQL-expressible ops the oracle is
  * a sequential Scala computation materialized as golden parquet, which the
  * driver then reads via read_parquet()).
  *
  * Independence note (same standard as graft.oracle.Oracle): the sequential
  * forms share only the LEAF definitions that ARE the operator spec — the
  * shingle hash (Spark's xxhash64 over the joined n-gram), the minhash
  * mix/fold, simhash64, the hyperplane family, and the float-exact cosine —
  * while candidate generation, joins, aggregation and top-k selection are
  * restated as plain loops with no Spark involvement.
  */
object OpsOracle {

  // ---- shared leaf: shingle spec (tokens → n-gram → xxhash64 seed 42) -----

  /** Distinct shingle hashes of a text — the sequential restatement of
    * `Dedup.shingles` semantics: trim ASCII spaces (Spark `trim`), split on
    * `\s+` keeping trailing empties (Spark `split` limit -1), require at
    * least n tokens, hash each space-joined n-gram with xxhash64(seed 42).
    */
  def shingleSet(text: String, n: Int): Set[Long] = {
    var s = text
    var i0 = 0; var i1 = s.length
    while (i0 < i1 && s.charAt(i0) == ' ') i0 += 1
    while (i1 > i0 && s.charAt(i1 - 1) == ' ') i1 -= 1
    s = s.substring(i0, i1)
    // same explicit class as TextOps.WsPlus (== Java \s — no behavior change)
    val toks = s.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    if (toks.length < n) return Set.empty
    (0 to toks.length - n).iterator.map { i =>
      val gram = toks.slice(i, i + n).mkString(" ")
      XxHash64Function.hash(UTF8String.fromString(gram), StringType, 42L)
    }.toSet
  }

  /** Exact jaccard in per-mille (floor), as the distributed form computes. */
  private def jaccardPm(a: Set[Long], b: Set[Long]): Long = {
    val inter = (a intersect b).size.toLong
    inter * 1000L / (a.size + b.size - inter)
  }

  // ---- n-gram jaccard pairs ----------------------------------------------

  /** Sequential `Dedup.ngramJaccardPairs`, mirroring its semantics exactly:
    * capped intersection counts from the df-capped inverted index, prefilter
    * on the capped jaccard, exact values for the survivors.
    * Returns (a, b, n_inter, n_a, n_b, jaccard_pm).
    */
  def ngramPairs(docs: Seq[(Long, String)], n: Int, minJaccardPm: Int,
                 maxDf: Int = 1000): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> shingleSet(t, n) }.toMap
    val posting = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    sets.foreach { case (id, sh) =>
      sh.foreach(h => posting.getOrElseUpdate(h, scala.collection.mutable.ArrayBuffer.empty) += id)
    }
    // capped intersection counts over shingles with df in [2, maxDf]
    val cappedInter = scala.collection.mutable.Map.empty[(Long, Long), Long]
    posting.values.foreach { ds =>
      if (ds.size >= 2 && ds.size <= maxDf) {
        val sorted = ds.sorted
        for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
          val key = (sorted(i), sorted(j))
          cappedInter(key) = cappedInter.getOrElse(key, 0L) + 1L
        }
      }
    }
    cappedInter.iterator.flatMap { case ((a, b), ic) =>
      val (sa, sb) = (sets(a), sets(b))
      // prefilter: capped_j >= threshold (exact rational form)
      if (ic * 1000L < minJaccardPm.toLong * (sa.size + sb.size - ic)) None
      else {
        val inter = (sa intersect sb).size.toLong
        val jpm = inter * 1000L / (sa.size + sb.size - inter)
        if (jpm >= minJaccardPm)
          Some((a, b, inter, sa.size.toLong, sb.size.toLong, jpm))
        else None
      }
    }.toSeq.sorted
  }

  // ---- minhash + LSH ------------------------------------------------------

  /** Sequential `Dedup.minHashNearDup`: k-min signatures (shared fold),
    * band buckets, candidate pairs, exact-jaccard verify.
    */
  def minhashPairs(docs: Seq[(Long, String)], n: Int, k: Int, bands: Int,
                   minJaccardPm: Int, maxBucket: Int = 1000): Seq[(Long, Long, Long)] = {
    val rowsPerBand = k / bands
    val sets = docs.map { case (id, t) => id -> shingleSet(t, n) }
      .filter(_._2.nonEmpty).toMap
    val buckets = scala.collection.mutable.Map.empty[(Int, Int), scala.collection.mutable.ArrayBuffer[Long]]
    sets.foreach { case (id, sh) =>
      val sig = Dedup.minhashSig(sh, k)
      for (b <- 0 until bands) {
        val key = (b, MurmurHash3.arrayHash(sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)))
        buckets.getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer.empty) += id
      }
    }
    val candidates = scala.collection.mutable.Set.empty[(Long, Long)]
    buckets.values.foreach { ds =>
      // mirrors the distributed maxBucket cap (mass-dup regime excluded)
      if (ds.size >= 2 && ds.size <= maxBucket) {
        val sorted = ds.distinct.sorted
        for (i <- sorted.indices; j <- (i + 1) until sorted.length)
          candidates += ((sorted(i), sorted(j)))
      }
    }
    candidates.iterator.flatMap { case (a, b) =>
      val jpm = jaccardPm(sets(a), sets(b))
      if (jpm >= minJaccardPm) Some((a, b, jpm)) else None
    }.toSeq.sorted
  }

  /** Sequential `Dedup.incrementalNearNew`: committed-index signatures
    * banded into buckets (the index-side maxBucket cap mirrored), batch
    * signatures probe their band buckets, agreement = count of equal
    * signature components, best match = (agreement desc, id asc), the
    * threshold compared in exact integer form (agree·1000 ≥ minAgreePm·k).
    * Returns (doc_id, match_id | −1, agree_pm | −1, is_new) per batch doc.
    */
  def incrementalNearNew(batch: Seq[(Long, String)], index: Seq[(Long, String)],
                         n: Int, k: Int, bands: Int, minAgreePm: Int,
                         maxBucket: Int = 1000): Seq[(Long, Long, Long, Long)] = {
    val rowsPerBand = k / bands
    def sigOf(t: String): Option[Array[Long]] = {
      val sh = shingleSet(t, n)
      if (sh.isEmpty) None else Some(Dedup.minhashSig(sh, k))
    }
    val idxSigs = index.flatMap { case (id, t) => sigOf(t).map(id -> _) }
    val buckets = scala.collection.mutable.Map
      .empty[(Int, Int), scala.collection.mutable.ArrayBuffer[Long]]
    idxSigs.foreach { case (id, sig) =>
      for (b <- 0 until bands) {
        val key = (b, MurmurHash3.arrayHash(sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)))
        buckets.getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer.empty) += id
      }
    }
    val live = buckets.filter(_._2.size <= maxBucket)
    val sigById = idxSigs.toMap
    batch.sortBy(_._1).map { case (id, t) =>
      sigOf(t) match {
        case None => (id, -1L, -1L, 1L)
        case Some(sig) =>
          val cand = scala.collection.mutable.Set.empty[Long]
          for (b <- 0 until bands) {
            val key = (b, MurmurHash3.arrayHash(sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)))
            live.get(key).foreach(ds => ds.foreach(cand += _))
          }
          val qual = cand.toSeq.map { mid =>
            val ms = sigById(mid)
            (sig.indices.count(i => sig(i) == ms(i)).toLong, mid)
          }.filter { case (agree, _) => agree * 1000 >= minAgreePm.toLong * k }
          if (qual.isEmpty) (id, -1L, -1L, 1L)
          else {
            val (agree, mid) = qual.maxBy { case (a, m) => (a, -m) }
            (id, mid, agree * 1000 / k, 0L)
          }
      }
    }
  }

  // ---- cluster assignment -------------------------------------------------

  /** Sequential `Dedup.dedupClusters`: union-find with path compression over
    * the near-dup pairs, roots kept at the minimum member id (so the
    * component label IS the min doc_id, matching the distributed min-label
    * propagation), singletons mapped to themselves.
    * Returns (doc_id, cluster_id, n_members, is_keep).
    */
  def clusterAssign(docIds: Seq[Long],
                    pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
    }
    val cluster = docIds.map(id => id -> find(id)).toMap
    val sizes = cluster.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    docIds.sorted.map { id =>
      val c = cluster(id)
      (id, c, sizes(c), if (id == c) 1L else 0L)
    }
  }

  // ---- simhash ------------------------------------------------------------

  /** Sequential `Dedup.simHashNearDup`: brute-force all-pairs Hamming (the
    * banding is exhaustive by the pigeonhole principle, so the distance
    * check stays fully independent of the distributed plan) PLUS the
    * distributed op's `maxBucket` hot-bucket contract, mirrored the same way
    * `minhashPairs` mirrors its cap: a pair survives only if it shares at
    * least one band key whose bucket holds ≤ maxBucket docs (over-cap
    * buckets are the exact-duplicate regime — run `Dedup.exact` first).
    */
  def simhashPairs(docs: Seq[(Long, String)], maxHamming: Int,
                   maxBucket: Int = 10000): Seq[(Long, Long, Int)] = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val mask = (1L << width) - 1
    val sims = docs.map { case (id, t) => id -> Dedup.simhash64(t) }.sortBy(_._1)
    def bandKeys(sim: Long): Seq[(Int, Long)] =
      (0 until nBands).map(b => (b, (sim >>> (b * width)) & mask))
    val bucketSize = scala.collection.mutable.Map.empty[(Int, Long), Int]
    sims.foreach { case (_, sim) =>
      bandKeys(sim).foreach(k => bucketSize(k) = bucketSize.getOrElse(k, 0) + 1)
    }
    def meetsInKeptBucket(s1: Long, s2: Long): Boolean =
      bandKeys(s1).exists { case (b, k) =>
        ((s2 >>> (b * width)) & mask) == k && bucketSize((b, k)) <= maxBucket
      }
    (for {
      i <- sims.indices.iterator
      j <- (i + 1) until sims.length
      h = java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2)
      if h <= maxHamming && meetsInKeptBucket(sims(i)._2, sims(j)._2)
    } yield (sims(i)._1, sims(j)._1, h)).toSeq.sorted
  }

  // ---- ANN ----------------------------------------------------------------

  /** Float-exact cosine: multiply in FLOAT precision, accumulate in double —
    * exactly what `Similarity.cosine` compiles to over array<float> columns
    * (zip_with multiply keeps float, aggregate widens each term to double).
    */
  def cosineF(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { val p: Float = a(i) * b(i); dot += p; i += 1 }
    i = 0
    while (i < a.length) { val p: Float = a(i) * a(i); na += p; i += 1 }
    i = 0
    while (i < b.length) { val p: Float = b(i) * b(i); nb += p; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def rankTopK(cands: Seq[(Long, Double)], k: Int): Seq[(Long, Int, Double)] =
    cands.sortBy { case (n, s) => (-s, n) }.take(k)
      .zipWithIndex.map { case ((n, s), i) => (n, i + 1, s) }

  /** Sequential `Similarity.bruteTopK`: (q_id, n_id, rank, score). */
  def bruteTopK(embs: Seq[(Long, Array[Float])], nQueries: Int, k: Int): Seq[(Long, Long, Int, Double)] =
    embs.filter(_._1 < nQueries).sortBy(_._1).flatMap { case (q, qv) =>
      val scored = embs.collect { case (n, nv) if n != q => (n, cosineF(qv, nv)) }
      rankTopK(scored, k).map { case (n, r, s) => (q, n, r, s) }
    }

  /** The multi-probe bucket set of a vector (own bucket + 1-bit flips). */
  private def probes(bucket: Int, nPlanes: Int): Set[Int] =
    (bucket +: Array.tabulate(nPlanes)(i => bucket ^ (1 << i))).toSet

  /** Sequential `Similarity.lshTopK`. */
  def lshTopK(embs: Seq[(Long, Array[Float])], nQueries: Int, k: Int,
              nPlanes: Int, seed: Long): Seq[(Long, Long, Int, Double)] = {
    val dim = embs.head._2.length
    val planes = Similarity.hyperplanesFor(dim, nPlanes, seed)
    val bucketed = embs.map { case (id, v) => (id, v, Similarity.bucketOf(v, planes)) }
    bucketed.filter(_._1 < nQueries).sortBy(_._1).flatMap { case (q, qv, qb) =>
      val pbs = probes(qb, nPlanes)
      val scored = bucketed.collect {
        case (n, nv, nb) if n != q && pbs.contains(nb) => (n, cosineF(qv, nv))
      }
      rankTopK(scored, k).map { case (n, r, s) => (q, n, r, s) }
    }
  }

  /** Sequential `Similarity.seedCodebook`: the nCells vectors with the
    * smallest content hash (md5 hex of the comma-joined floor(x·10^6)
    * micro-unit rendering), restated with a plain sort — id-space
    * independent like the distributed selection.
    */
  def seedCodebook(embs: Seq[(Long, Array[Float])],
                   nCells: Int): Array[Array[Float]] =
    embs.map { case (_, v) =>
      val s = v.map(x => math.floor(x.toDouble * 1e6).toLong).mkString(",")
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      (h, v)
    }.sortBy(_._1).take(nCells).map(_._2).toArray

  /** Sequential `Similarity.kmeansCodebook`: a plain in-memory Lloyd loop
    * over the same pinned micro-unit arithmetic (floor components to micro
    * longs, long-sum per cell, floorDiv by the cell count) — shares only the
    * [[Similarity.ivfCellOf]] assignment leaf; the aggregation is restated
    * as sequential accumulation, independently of the distributed groupBy.
    * Seeded from the content-hash [[seedCodebook]] init.
    */
  def kmeansCodebook(embs: Seq[(Long, Array[Float])], nCells: Int,
                     iters: Int): Array[Array[Float]] = {
    var cent = seedCodebook(embs, nCells)
    for (_ <- 0 until iters) {
      val dim = cent(0).length
      val sums = Array.ofDim[Long](cent.length, dim)
      val counts = new Array[Long](cent.length)
      embs.foreach { case (_, v) =>
        val c = Similarity.ivfCellOf(v, cent)
        counts(c) += 1
        var d = 0
        while (d < v.length && d < dim) {
          sums(c)(d) += math.floor(v(d).toDouble * 1e6).toLong; d += 1
        }
      }
      cent = Array.tabulate(cent.length) { c =>
        if (counts(c) == 0) cent(c)
        else Array.tabulate(dim)(d => (Math.floorDiv(sums(c)(d), counts(c)) / 1e6).toFloat)
      }
    }
    cent
  }

  /** Sequential `Similarity.ivfTopK`: deterministic content-hash codebook
    * (Lloyd-refined when trainIters > 0), nearest-cell assignment, nProbe
    * query cells, exact cosine, top-k.
    */
  def ivfTopK(embs: Seq[(Long, Array[Float])], nQueries: Int, k: Int,
              nCells: Int, nProbe: Int, trainIters: Int = 0): Seq[(Long, Long, Int, Double)] = {
    val centroids =
      if (trainIters > 0) kmeansCodebook(embs, nCells, trainIters)
      else seedCodebook(embs, nCells)
    val celled = embs.map { case (id, v) =>
      (id, v, Similarity.ivfCellOf(v, centroids)) }
    celled.filter(_._1 < nQueries).sortBy(_._1).flatMap { case (q, qv, _) =>
      val probed = centroids.indices
        .map(c => (c, cosineF(qv, centroids(c))))
        .sortBy { case (c, s) => (-s, c) }
        .take(math.min(nProbe, centroids.length))
        .map(_._1).toSet
      val scored = celled.collect {
        case (n, nv, nc) if n != q && probed.contains(nc) => (n, cosineF(qv, nv))
      }
      rankTopK(scored, k).map { case (n, r, s) => (q, n, r, s) }
    }
  }

  /** Sequential `Similarity.pqCodebooks`: content-hash seed init (smallest
    * ks residuals, split into m sub-vectors), then plain in-memory Lloyd
    * rounds over the same micro-unit arithmetic. Shares only the
    * [[Similarity.pqNearestCode]] / [[Similarity.subVec]] leaves; the
    * one-pass-all-subspaces aggregation is restated sequentially.
    */
  def pqCodebooks(resids: Seq[Array[Float]], m: Int, ks: Int,
                  iters: Int): Array[Array[Array[Float]]] = {
    val seeds = seedCodebook(resids.map(v => (0L, v)), ks)
    val dim = seeds(0).length
    val subDim = dim / m
    var books: Array[Array[Array[Float]]] =
      Array.tabulate(m)(s => Array.tabulate(seeds.length)(j =>
        Similarity.subVec(seeds(j), s, subDim)))
    for (_ <- 0 until iters) {
      val sums = Array.ofDim[Long](m * ks, subDim)
      val counts = new Array[Long](m * ks)
      resids.foreach { v =>
        var s = 0
        while (s < m) {
          val sub = Similarity.subVec(v, s, subDim)
          val key = s * ks + Similarity.pqNearestCode(sub, books(s))
          counts(key) += 1
          var d = 0
          while (d < subDim) {
            sums(key)(d) += math.floor(sub(d).toDouble * 1e6).toLong; d += 1
          }
          s += 1
        }
      }
      books = Array.tabulate(m)(s => Array.tabulate(books(s).length) { j =>
        val key = s * ks + j
        if (counts(key) == 0) books(s)(j)
        else Array.tabulate(subDim)(d =>
          (Math.floorDiv(sums(key)(d), counts(key)) / 1e6).toFloat)
      })
    }
    books
  }

  /** Sequential `Similarity.ivfpqTopK`: coarse content-hash (or Lloyd)
    * codebook, residual PQ codes, cosine-ranked nProbe cells, asymmetric
    * table scoring (coarse inner product + Σ sub-table lookups), top-k by
    * (score desc, n_id).
    */
  def ivfpqTopK(embs: Seq[(Long, Array[Float])], nQueries: Int, k: Int,
                nCells: Int, nProbe: Int, m: Int, ks: Int,
                pqIters: Int, coarseIters: Int = 0): Seq[(Long, Long, Int, Double)] = {
    val coarse =
      if (coarseIters > 0) kmeansCodebook(embs, nCells, coarseIters)
      else seedCodebook(embs, nCells)
    val subDim = coarse(0).length / m
    val resids = embs.map { case (id, v) =>
      val c = Similarity.ivfCellOf(v, coarse)
      (id, c, Similarity.residualOf(v, coarse(c)))
    }
    val books = pqCodebooks(resids.map(_._3), m, ks, pqIters)
    val codes = resids.map { case (id, c, r) =>
      (id, c, Array.tabulate(m)(s =>
        Similarity.pqNearestCode(Similarity.subVec(r, s, subDim), books(s))))
    }
    embs.filter(_._1 < nQueries).sortBy(_._1).flatMap { case (q, qv) =>
      val tables = Similarity.adcTables(qv, books, ks)
      val probed = coarse.indices
        .map(c => (c, cosineF(qv, coarse(c))))
        .sortBy { case (c, s) => (-s, c) }
        .take(math.min(nProbe, coarse.length))
        .map { case (c, _) => c -> Similarity.ipF(qv, coarse(c)) }.toMap
      val scored = codes.collect {
        case (n, nc, ncodes) if n != q && probed.contains(nc) =>
          // association pinned to the engine expression: the table sum
          // folds from 0.0 first, THEN adds the coarse inner product
          var t = 0.0
          var i = 0
          while (i < m) { t += tables(i * ks + ncodes(i)); i += 1 }
          (n, probed(nc) + t)
      }
      rankTopK(scored, k).map { case (n, r, s) => (q, n, r, s) }
    }
  }

  /** Sequential `Similarity.ivfpqRerankTopK`: PQ shortlist of
    * shortlistFactor×k per query, exact-cosine re-rank, top-k by
    * (score desc, n_id).
    */
  def ivfpqRerankTopK(embs: Seq[(Long, Array[Float])], nQueries: Int, k: Int,
                      nCells: Int, nProbe: Int, m: Int, ks: Int, pqIters: Int,
                      shortlistFactor: Int): Seq[(Long, Long, Int, Double)] = {
    val short = ivfpqTopK(embs, nQueries, k * shortlistFactor, nCells, nProbe,
        m, ks, pqIters)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byId = embs.toMap
    embs.filter(_._1 < nQueries).sortBy(_._1).flatMap { case (q, qv) =>
      val cand = short.getOrElse(q, Set.empty)
      val scored = cand.toSeq.map(n => (n, cosineF(qv, byId(n))))
      rankTopK(scored, k).map { case (n, r, s) => (q, n, r, s) }
    }
  }

  /** Sequential int8 codes (shared arithmetic with `Similarity.quantizeCodes`). */
  def q8Codes(v: Array[Float]): Array[Long] = {
    val scale = v.map(x => math.abs(x)).max.toDouble
    v.map(x => math.floor(x.toDouble / scale * 127 + 0.5).toLong)
  }

  /** Sequential `Similarity.quantizedTopK`: integer dot products of codes,
    * rank by (score desc, n_id). Returns (q_id, n_id, rank, score_int).
    */
  def quantizedTopK(embs: Seq[(Long, Array[Float])], nQueries: Int,
                    k: Int): Seq[(Long, Long, Int, Long)] = {
    val codes = embs.map { case (id, v) => (id, q8Codes(v)) }
    codes.filter(_._1 < nQueries).sortBy(_._1).flatMap { case (q, qc) =>
      val scored = codes.collect { case (n, nc) if n != q =>
        var s = 0L; var i = 0
        val len = math.min(qc.length, nc.length)
        while (i < len) { s += qc(i) * nc(i); i += 1 }
        (n, s)
      }
      scored.sortBy { case (n, s) => (-s, n) }.take(k)
        .zipWithIndex.map { case ((n, s), i) => (q, n, i + 1, s) }
    }
  }

  /** Sequential `Similarity.cosineNearDup`: pair (a<b) is a candidate iff
    * b's bucket is in a's probe set (probe expansion runs on the smaller-id
    * side in the distributed join); exact cosine, threshold in per-mille.
    */
  def cosineNearDup(embs: Seq[(Long, Array[Float])], minCosinePm: Int,
                    nPlanes: Int, seed: Long): Seq[(Long, Long, Double)] = {
    val dim = embs.head._2.length
    val planes = Similarity.hyperplanesFor(dim, nPlanes, seed)
    val bucketed = embs.map { case (id, v) => (id, v, Similarity.bucketOf(v, planes)) }
      .sortBy(_._1)
    (for {
      i <- bucketed.indices.iterator
      j <- (i + 1) until bucketed.length
      (a, av, ab) = bucketed(i)
      (b, bv, bb) = bucketed(j)
      if probes(ab, nPlanes).contains(bb)
      s = cosineF(av, bv)
      if s * 1000 >= minCosinePm
    } yield (a, b, s)).toSeq
  }

  /** Sequential `Similarity.semanticDedup`: same cell assignment leaf
    * ([[Similarity.ivfCellOf]] over the micro-unit Lloyd codebook), within-
    * cell lower-id scan restated as a plain loop; mirrors the op's cell-size
    * contract (singleton and over-`maxCell` cells produce no pairs).
    * Returns (vec_id, cell, dup_of | −1, keep).
    */
  def semanticDedup(embs: Seq[(Long, Array[Float])], minCosinePm: Int,
                    nCells: Int, trainIters: Int,
                    maxCell: Int = 100000): Seq[(Long, Long, Long, Long)] = {
    val cents =
      if (trainIters > 0) kmeansCodebook(embs, nCells, trainIters)
      else seedCodebook(embs, nCells)
    val celled = embs.map { case (id, v) => (id, v, Similarity.ivfCellOf(v, cents)) }
    val sizes = celled.groupBy(_._3).map { case (c, vs) => c -> vs.size }
    celled.sortBy(_._1).map { case (id, v, c) =>
      val lower =
        if (sizes(c) < 2 || sizes(c) > maxCell) Seq.empty
        else celled.collect {
          case (oid, ov, oc) if oc == c && oid < id &&
            cosineF(ov, v) * 1000 >= minCosinePm => oid
        }
      if (lower.isEmpty) (id, c.toLong, -1L, 1L)
      else (id, c.toLong, lower.min, 0L)
    }
  }

  /** Sequential `Similarity.perturbed` (shared perturbation leaf). */
  /** Sequential `Similarity.semanticDecontam`: for every corpus vector, the
    * best (score desc, eval_id asc) eval match with cos·1000 ≥ minCosinePm,
    * or nothing. The threshold compares the raw double (like the
    * distributed `where`); only the OUTPUT is floored to per-mille.
    */
  def semanticDecontam(corpus: Seq[(Long, Array[Float])],
                       evals: Seq[(Long, Array[Float])],
                       minCosinePm: Int): Seq[(Long, Long, Long)] =
    corpus.flatMap { case (id, v) =>
      val qual = evals.map { case (eid, ev) => (eid, cosineF(v, ev)) }
        .filter(_._2 * 1000 >= minCosinePm)
      if (qual.isEmpty) Nil
      else {
        val best = qual.maxBy { case (eid, s) => (s, -eid) }
        Seq((id, best._1, math.floor(best._2 * 1000).toLong))
      }
    }

  /** Sequential `Similarity.randomProject`: identical md5-parity sign
    * matrix and micro-first integer arithmetic, restated as a flat loop.
    */
  def randomProject(embs: Seq[(Long, Array[Float])], outDim: Int,
                    seed: Long): Seq[(Long, Array[Long])] = {
    def signs(dim: Int): Array[Array[Int]] =
      Array.tabulate(outDim, dim) { (j, i) =>
        if ((md5Hex8(s"rp:$seed:$j:$i") & 1L) == 0L) 1 else -1
      }
    var s: Array[Array[Int]] = null
    embs.map { case (id, v) =>
      if (s == null || s(0).length != v.length) s = signs(v.length)
      (id, Array.tabulate(outDim)(j =>
        v.indices.map(i => math.round(v(i).toDouble * 1e6d) * s(j)(i)).sum))
    }
  }

  def perturbed(embs: Seq[(Long, Array[Float])], n: Int, seed: Long = 7,
                noise: Float = 0.002f, idOffset: Long = 1000000L): Seq[(Long, Array[Float])] =
    embs.filter(_._1 < n).map { case (id, v) =>
      val rng = new scala.util.Random(seed + id)
      (id + idOffset, v.map(x => x + (rng.nextFloat() - 0.5f) * 2 * noise))
    }

  // ---- benchmark decontamination -----------------------------------------

  /** Code-point substring mirroring Spark's `substring(str, pos, len)`
    * (1-based, counts code points, out-of-range clamps to empty).
    */
  def cpSubstring(s: String, pos1: Int, len: Int): String = {
    val cps = s.codePoints().toArray
    val from = math.min(math.max(pos1 - 1, 0), cps.length)
    val until = math.min(from + math.max(len, 0), cps.length)
    new String(cps, from, until - from)
  }

  /** Sequential `Dedup.decontaminate`: a doc is contaminated iff its
    * distinct shingle set intersects the union of the benchmark texts'
    * shingle sets; n_overlap = the intersection size.
    */
  def decontaminate(docs: Seq[(Long, String)], bench: Seq[String],
      n: Int): Seq[(Long, Long, Long)] = {
    val benchAll: Set[Long] =
      bench.iterator.flatMap(t => shingleSet(t, n)).toSet
    docs.map { case (id, text) =>
      val ov = (shingleSet(text, n) intersect benchAll).size.toLong
      (id, ov, if (ov > 0) 1L else 0L)
    }
  }

  // ---- BPE merge training --------------------------------------------------

  /** Sequential `TextOps.bpeMerges`, restated independently on immutable
    * Lists: word counts from the raw docs (same trim/split leaf as
    * [[wsTokenCount]]), deterministic (count desc, word asc) top-`maxVocab`
    * cut, then nMerges rounds of best-pair selection
    * (count desc, left asc, right asc) with greedy left-to-right
    * non-overlapping replacement. Returns (rank, left, right, n_occ).
    */
  /** Sequential `TextOps.wordpieceMerges`: independent immutable-list
    * restatement of the likelihood-scored merge loop — argmax of
    * c/(l·r) by BigInt cross-multiplication, ties (left, right) asc.
    * Returns (rank, left, right, n_occ, l_cnt, r_cnt).
    */
  def wordpieceMerges(docs: Seq[(Long, String)], nMerges: Int,
                      maxVocab: Int): Seq[(Long, String, String, Long, Long, Long)] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    val vocab = docs.flatMap(d => toks(d._2)).groupBy(identity)
      .map { case (w, xs) => (w, xs.size.toLong) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(maxVocab)

    def replace(ss: List[String], l: String, r: String): List[String] = ss match {
      case a :: b :: rest if a == l && b == r => (l + r) :: replace(rest, l, r)
      case a :: rest => a :: replace(rest, l, r)
      case Nil => Nil
    }

    var seqs: Seq[(List[String], Long)] = vocab.map { case (w, c) =>
      (w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp))), c)
    }
    (0 until nMerges).iterator.map { r =>
      val pc = seqs.flatMap { case (ss, c) => ss.zip(ss.drop(1)).map(p => p -> c) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val uc = seqs.flatMap { case (ss, c) => ss.map(_ -> c) }
        .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sum }
      if (pc.isEmpty) None
      else {
        val ((l, rt), cnt) = pc.toSeq.sortWith { case (((a1, b1), n1), ((a2, b2), n2)) =>
          val cmp = (BigInt(n1) * BigInt(uc(a2)) * BigInt(uc(b2)))
            .compare(BigInt(n2) * BigInt(uc(a1)) * BigInt(uc(b1)))
          cmp > 0 || (cmp == 0 && (a1 < a2 || (a1 == a2 && b1 < b2)))
        }.head
        val res = (r.toLong, l, rt, cnt, uc(l), uc(rt))
        seqs = seqs.map { case (ss, c) => (replace(ss, l, rt), c) }
        Some(res)
      }
    }.takeWhile(_.isDefined).flatten.toSeq
  }

  def bpeMerges(docs: Seq[(Long, String)], nMerges: Int,
                maxVocab: Int): Seq[(Long, String, String, Long)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text) =>
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.nonEmpty)
        t.split("[ \\t\\n\\x0B\\f\\r]+", -1).foreach { w =>
          counts(w) = counts.getOrElse(w, 0L) + 1L
        }
    }
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(maxVocab)

    def pairCounts(seqs: Seq[(List[String], Long)]): Map[(String, String), Long] =
      seqs.flatMap { case (ss, c) =>
        ss.zip(ss.drop(1)).map(p => p -> c)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

    def replace(ss: List[String], l: String, r: String): List[String] = ss match {
      case a :: b :: rest if a == l && b == r => (l + r) :: replace(rest, l, r)
      case a :: rest => a :: replace(rest, l, r)
      case Nil => Nil
    }

    var seqs: Seq[(List[String], Long)] = vocab.map { case (w, c) =>
      (w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp))), c)
    }
    (0 until nMerges).iterator.map { r =>
      val pc = pairCounts(seqs)
      if (pc.isEmpty) None
      else {
        val ((l, rt), cnt) = pc.minBy { case ((a, b), n) => (-n, a, b) }
        seqs = seqs.map { case (ss, c) => (replace(ss, l, rt), c) }
        Some((r.toLong, l, rt, cnt))
      }
    }.takeWhile(_.isDefined).flatten.toSeq
  }

  // ---- BPE encode (tokenizer inference) ------------------------------------

  /** Sequential `TextOps.bpeEncode`, restated on immutable Lists: per word,
    * repeatedly merge the adjacent pair with the lowest merge rank
    * (all non-overlapping occurrences, left to right) until no learned pair
    * remains. Returns (doc_id, n_words, n_pieces, pieces_md5) with the same
    * space/newline piece-sequence pinning.
    */
  def bpeEncode(docs: Seq[(Long, String)],
                merges: Seq[(String, String)]): Seq[(Long, Long, Long, String)] = {
    val rank = merges.zipWithIndex.toMap
    def mergeWord(w: String): List[String] = {
      def step(ps: List[String]): List[String] = {
        val pairs = ps.zip(ps.drop(1))
        val ranked = pairs.flatMap(p => rank.get(p).map(r => (r, p)))
        if (ranked.isEmpty) ps
        else {
          val (_, (l, r)) = ranked.minBy(_._1)
          def replace(xs: List[String]): List[String] = xs match {
            case a :: b :: rest if a == l && b == r => (l + r) :: replace(rest)
            case a :: rest => a :: replace(rest)
            case Nil => Nil
          }
          step(replace(ps))
        }
      }
      step(w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp))))
    }
    docs.map { case (id, text) =>
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      val words: List[String] =
        if (t.isEmpty) Nil else t.split("[ \\t\\n\\x0B\\f\\r]+", -1).toList
      val encoded = words.map(mergeWord)
      val doc = encoded.map(_.mkString(" ")).mkString("\n")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(doc.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, words.length.toLong, encoded.map(_.length.toLong).sum, hex)
    }
  }

  // ---- WordPiece encode (tokenizer inference) -------------------------------

  /** Sequential `TextOps.wordpieceVocab`: alphabet of the whitespace tokens'
    * code points plus the wordpieceMerges concatenations, distinct + sorted.
    */
  def wordpieceVocab(docs: Seq[(Long, String)], nMerges: Int,
                     maxVocab: Int): Seq[String] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    val alphabet = docs.flatMap(d => toks(d._2)).iterator
      .flatMap(w => w.codePoints().toArray.map(cp => new String(Character.toChars(cp))))
      .toSeq.distinct
    val merged = wordpieceMerges(docs, nMerges, maxVocab)
      .map { case (_, l, r, _, _, _) => l + r }
    (alphabet ++ merged).distinct.sorted
  }

  /** Sequential `TextOps.wordpieceEncode`, restated recursively: greedy
    * longest-vocab-prefix per position, `##` continuation markers, whole
    * word -> unk when some position has no matching prefix. Returns
    * (doc_id, n_words, n_pieces, pieces_md5) with the same space/newline
    * piece-sequence pinning as bpeEncode.
    */
  def wordpieceEncode(docs: Seq[(Long, String)], vocab: Seq[String],
                      unk: String = "[UNK]"): Seq[(Long, Long, Long, String)] = {
    val vset = vocab.toSet
    val maxLen = vocab.map(_.length).max
    def word(w: String): List[String] = {
      def go(i: Int): Option[List[String]] =
        if (i >= w.length) Some(Nil)
        else (math.min(w.length, i + maxLen) to (i + 1) by -1).iterator
          .map(j => w.substring(i, j))
          .find(vset)
          .flatMap(p => go(i + p.length)
            .map(rest => (if (i == 0) p else "##" + p) :: rest))
      if (w.isEmpty) Nil else go(0).getOrElse(List(unk))
    }
    docs.map { case (id, text) =>
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      val words: List[String] =
        if (t.isEmpty) Nil else t.split("[ \\t\\n\\x0B\\f\\r]+", -1).toList
      val encoded = words.map(word)
      val doc = encoded.map(_.mkString(" ")).mkString("\n")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(doc.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, words.length.toLong, encoded.map(_.length.toLong).sum, hex)
    }
  }

  // ---- unigram-LM tokenizer (SentencePiece-style) ---------------------------

  /** Exact unigram Viterbi — the SHARED LEAF that IS the operator spec
    * (like [[shingleSet]]): maximize Π count(piece)/total with BigInt
    * cross-multiplied comparison, fewer-pieces tiebreak, lengths probed
    * longest-first replacing only on strictly-better (→ longest piece wins
    * residual ties). Restated here recursively over code-point prefixes
    * with memoization; whole-word `unk` when unsegmentable.
    */
  private def unigramViterbi(w: String, counts: Map[String, Long],
      total: Long, maxPieceLen: Int, unk: String): List[String] = {
    if (w.isEmpty) return Nil
    val cps: Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    val tot = BigInt(total)
    // best(i) = (k, product, pieces) of the best segmentation of cps[0,i)
    val memo = new Array[Option[(Int, BigInt, List[String])]](cps.length + 1)
    memo(0) = Some((0, BigInt(1), Nil))
    (1 to cps.length).foreach { i =>
      memo(i) = (math.min(maxPieceLen, i) to 1 by -1).iterator.flatMap { l =>
        val piece = cps.slice(i - l, i).mkString
        for {
          prev <- memo(i - l)
          c <- counts.get(piece)
        } yield (prev._1 + 1, prev._2 * c, piece :: prev._3)
      }.reduceOption { (a, b) =>
        val cmp = (a._2 * tot.pow(b._1)).compare(b._2 * tot.pow(a._1))
        if (cmp > 0 || (cmp == 0 && a._1 <= b._1)) a else b
      }
    }
    memo(cps.length).map(_._3.reverse).getOrElse(List(unk))
  }

  private def wordCounts(docs: Seq[(Long, String)]): Seq[(String, Long)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text) =>
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.nonEmpty)
        t.split("[ \\t\\n\\x0B\\f\\r]+", -1).foreach { w =>
          counts(w) = counts.getOrElse(w, 0L) + 1L
        }
    }
    counts.toSeq.sortBy { case (w, c) => (-c, w) }
  }

  /** Sequential `TextOps.unigramVocab`: top-`maxVocab` word counts, every
    * 1..maxPieceLen code-point substring occurrence counted for the seed,
    * top-`seedSize` seeds plus the alphabet, then `emIters` hard-EM rounds
    * (Viterbi resegment → usage recount → alphabet floor 1 → prune
    * multi-char pieces to vocabSize − |alphabet| by (usage desc, piece
    * asc)). Returns (rank, piece, n_occ) in (n_occ desc, piece asc) order.
    */
  def unigramVocabSeq(docs: Seq[(Long, String)], vocabSize: Int,
      maxPieceLen: Int, seedSize: Int, emIters: Int,
      maxVocab: Int = 1 << 20): Seq[(Long, String, Long)] = {
    val words = wordCounts(docs).take(maxVocab)
    val cpsOf: String => Vector[String] =
      w => w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    val alphabet = words.iterator.flatMap(w => cpsOf(w._1)).toSet
    val seedCnt = words.foldLeft(Map.empty[String, Long]) { case (m0, (w, c)) =>
      val cps = cpsOf(w)
      cps.indices.foldLeft(m0) { (m1, i) =>
        (1 to math.min(maxPieceLen, cps.length - i)).foldLeft(m1) { (m, l) =>
          val p = cps.slice(i, i + l).mkString
          m.updated(p, m.getOrElse(p, 0L) + c)
        }
      }
    }
    val seed = seedCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var counts: Map[String, Long] =
      (seed ++ alphabet.iterator.map(a => a -> seedCnt(a))).toMap
    (1 to emIters).foreach { _ =>
      val total = counts.valuesIterator.sum
      val usage0 = words.foldLeft(Map.empty[String, Long]) { case (m0, (w, c)) =>
        unigramViterbi(w, counts, total, maxPieceLen, unk = " ")
          .foldLeft(m0)((m, p) => m.updated(p, m.getOrElse(p, 0L) + c))
      }
      val usage = alphabet.foldLeft(usage0)((m, a) =>
        m.updated(a, math.max(m.getOrElse(a, 0L), 1L)))
      val keepMulti = usage.toSeq.filterNot(kv => alphabet(kv._1))
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - alphabet.size))
      counts = (usage.filter(kv => alphabet(kv._1)).toSeq ++ keepMulti).toMap
    }
    counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .zipWithIndex.map { case ((p, c), r) => (r.toLong, p, c) }
  }

  /** Sequential `TextOps.unigramEncode`: Viterbi-segment every whitespace
    * word under the trained (piece → count) model; same output contract as
    * [[bpeEncode]]/[[wordpieceEncode]].
    */
  def unigramEncodeSeq(docs: Seq[(Long, String)], vocab: Seq[(String, Long)],
      unk: String = "[UNK]"): Seq[(Long, Long, Long, String)] = {
    val counts = vocab.toMap
    val total = vocab.iterator.map(_._2).sum
    val maxLen = vocab.iterator.map(p => p._1.codePointCount(0, p._1.length)).max
    docs.map { case (id, text) =>
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      val words: List[String] =
        if (t.isEmpty) Nil else t.split("[ \\t\\n\\x0B\\f\\r]+", -1).toList
      val encoded = words.map(w => unigramViterbi(w, counts, total, maxLen, unk))
      val doc = encoded.map(_.mkString(" ")).mkString("\n")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(doc.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, words.length.toLong, encoded.map(_.length.toLong).sum, hex)
    }
  }

  // ---- token-distribution entropy ------------------------------------------

  /** Sequential `TextOps.tokenEntropy`, restated on immutable collections:
    * whitespace tokens, per-TYPE micro-nat term `c·round(ln(n/c)·1e6)`
    * (StrictMath.log) summed as longs, truncated Long division for the
    * per-token average, blank docs emitting (0, 0, 0, 0). Returns
    * (doc_id, n_toks, n_types, h_micro_tot, h_micro_per_tok).
    */
  def tokenEntropySeq(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long)] =
    docs.map { case (id, text) =>
      val t = text.trim
      val ts: Array[String] =
        if (t.isEmpty) Array.empty[String] else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
      if (ts.isEmpty) (id, 0L, 0L, 0L, 0L)
      else {
        val n = ts.length.toLong
        val counts = ts.groupBy(identity).map { case (_, xs) => xs.length.toLong }
        val tot = counts.iterator
          .map(c => c * Math.round(StrictMath.log(n.toDouble / c.toDouble) * 1e6d))
          .sum
        (id, n, counts.size.toLong, tot, tot / n)
      }
    }

  // ---- bigram-LM perplexity score ------------------------------------------

  /** Sequential `TextOps.lmScore`, restated on immutable collections with
    * the model contract spelled out inline: top-`vocabSize` unigram
    * vocabulary (count desc, token asc), `<unk>` normalization, FULL context
    * counts, top-`maxBigrams` bigram table (count desc, prev asc, cur asc;
    * cut transitions score at the Laplace floor), per-transition micro-nat
    * rounding via `StrictMath.log` BEFORE the per-doc sum, truncated Long
    * division for the per-token average. Returns
    * (doc_id, n_trans, lp_micro_tot, lp_micro_per_tok).
    */
  def lmScore(docs: Seq[(Long, String)], vocabSize: Int,
              maxBigrams: Int): Seq[(Long, Long, Long, Long)] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    val docToks = docs.map { case (id, t) => id -> toks(t) }
    val uniCnt = docToks.iterator.flatMap(_._2).toSeq
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val vocab = uniCnt.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(vocabSize).map(_._1).toSet
    val vModel = vocab.size + 1L // + <unk>
    def nrm(t: String): String = if (vocab(t)) t else "<unk>"
    val allPairs = docToks.flatMap { case (_, ts) =>
      ts.zip(ts.drop(1)).map { case (a, b) => (nrm(a), nrm(b)) }
    }
    val bigAll = allPairs.groupBy(identity)
      .map { case (p, xs) => p -> xs.size.toLong }
    val bigrams = bigAll.toSeq
      .sortBy { case ((p, c), n) => (-n, p, c) }.take(maxBigrams).toMap
    val contexts = allPairs.groupBy(_._1)
      .map { case (p, xs) => p -> xs.size.toLong }
    docToks.map { case (id, ts) =>
      if (ts.length < 2) (id, 0L, 0L, 0L)
      else {
        val lps = ts.zip(ts.drop(1)).map { case (a, b) =>
          val (pa, pb) = (nrm(a), nrm(b))
          val cb = bigrams.getOrElse((pa, pb), 0L)
          val cu = contexts(pa)
          Math.round(StrictMath.log((cb + 1.0d) /
            (cu.toDouble + vModel.toDouble)) * 1e6d)
        }
        val tot = lps.sum
        (id, lps.length.toLong, tot, tot / lps.length.toLong)
      }
    }
  }

  /** Sequential `TextOps.backoffLmScore`: the identical stupid-backoff
    * contract — vocab = top-`vocabSize` tokens (count desc, token asc),
    * all model counts from the normalized trigram-transition stream
    * (positions i ≥ 2), tri/bi tables capped by (count desc, keys asc),
    * per-transition `round((k·ln α + ln(num/den))·1e6)` with StrictMath,
    * docs under 3 tokens → zeros. Returns
    * (doc_id, n_trans, lp_micro_tot, lp_micro_per_tok).
    */
  def backoffLmSeq(docs: Seq[(Long, String)], vocabSize: Int,
                   maxTrigrams: Int, maxBigrams: Int,
                   alphaPm: Int): Seq[(Long, Long, Long, Long)] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    val docToks = docs.map { case (id, t) => id -> toks(t) }
    val uniCnt = docToks.iterator.flatMap(_._2).toSeq
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val vocab = uniCnt.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(vocabSize).map(_._1).toSet
    val vModel = vocab.size + 1L // + <unk>
    def nrm(t: String): String = if (vocab(t)) t else "<unk>"
    val stream = docToks.flatMap { case (_, ts) =>
      (2 until ts.length).map(i => (nrm(ts(i - 2)), nrm(ts(i - 1)), nrm(ts(i))))
    }
    val triAll = stream.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val triTab = triAll.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(maxTrigrams).toMap
    val biCtx = stream.groupBy(t => (t._1, t._2))
      .map { case (k, xs) => k -> xs.size.toLong }
    val biAll = stream.groupBy(t => (t._2, t._3))
      .map { case (k, xs) => k -> xs.size.toLong }
    val biTab = biAll.toSeq
      .sortBy { case ((p, c), n) => (-n, p, c) }.take(maxBigrams).toMap
    val p1Ctx = stream.groupBy(_._2).map { case (k, xs) => k -> xs.size.toLong }
    val uni = stream.groupBy(_._3).map { case (k, xs) => k -> xs.size.toLong }
    val nTot = stream.size.toLong
    def lp(k: Long, num: Long, den: Long): Long =
      Math.round((k * StrictMath.log(alphaPm.toDouble / 1000.0d) +
        StrictMath.log(num.toDouble / den.toDouble)) * 1e6d)
    docToks.map { case (id, ts) =>
      if (ts.length < 3) (id, 0L, 0L, 0L)
      else {
        val lps = (2 until ts.length).map { i =>
          val tr = (nrm(ts(i - 2)), nrm(ts(i - 1)), nrm(ts(i)))
          if (triTab.contains(tr)) lp(0L, triTab(tr), biCtx((tr._1, tr._2)))
          else if (biTab.contains((tr._2, tr._3)))
            lp(1L, biTab((tr._2, tr._3)), p1Ctx(tr._2))
          else lp(2L, uni(tr._3) + 1L, nTot + vModel)
        }
        val tot = lps.sum
        (id, lps.length.toLong, tot, tot / lps.length.toLong)
      }
    }
  }

  // ---- Naive Bayes quality classifier ---------------------------------------

  /** Sequential `TextOps.nbQualityScore`, restated with the model contract
    * inline: seed = labeled (doc_id, label) rows joined to doc text;
    * top-`vocabSize` seed tokens by (total count desc, token asc); per-class
    * Laplace token likelihoods over the capped vocab (model size =
    * |vocab| + 1, OOV scores as count 0); Laplace class prior
    * ln((n_c+1)/(n_docs+2)); every log rounded to micro-nats via
    * `StrictMath.log` BEFORE the per-doc sum. Returns
    * (doc_id, n_toks, lp1_micro, lp0_micro, margin_micro, nb_label).
    */
  def nbScore(docs: Seq[(Long, String)], labels: Map[Long, Int],
              vocabSize: Int): Seq[(Long, Long, Long, Long, Long, Int)] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    def lpm(cb: Long, cu: Long, v: Long): Long =
      Math.round(StrictMath.log((cb + 1.0d) / (cu.toDouble + v.toDouble)) * 1e6d)

    val docToks = docs.map { case (id, t) => id -> toks(t) }
    val seed = docToks.collect {
      case (id, ts) if labels.contains(id) => (labels(id), ts)
    }
    val cnt = collection.mutable.Map.empty[String, (Long, Long)]
    seed.foreach { case (lb, ts) =>
      ts.foreach { t =>
        val (c1, c0) = cnt.getOrElse(t, (0L, 0L))
        cnt(t) = if (lb == 1) (c1 + 1, c0) else (c1, c0 + 1)
      }
    }
    val vocab = cnt.toSeq
      .sortBy { case (t, (c1, c0)) => (-(c1 + c0), t) }
      .take(vocabSize).toMap
    val t1 = vocab.valuesIterator.map(_._1).sum
    val t0 = vocab.valuesIterator.map(_._2).sum
    val vModel = vocab.size + 1L
    val n1 = seed.count(_._1 == 1).toLong
    val n0 = seed.count(_._1 == 0).toLong
    val prior1 = lpm(n1, n1 + n0, 2L)
    val prior0 = lpm(n0, n1 + n0, 2L)

    docToks.map { case (id, ts) =>
      var ll1 = 0L; var ll0 = 0L
      ts.foreach { t =>
        val (c1, c0) = vocab.getOrElse(t, (0L, 0L))
        ll1 += lpm(c1, t1, vModel)
        ll0 += lpm(c0, t0, vModel)
      }
      val lp1 = ll1 + prior1
      val lp0 = ll0 + prior0
      val m = lp1 - lp0
      (id, ts.length.toLong, lp1, lp0, m, if (m > 0L) 1 else 0)
    }
  }

  // ---- per-source KL divergence ----------------------------------------------

  /** Sequential `TextOps.sourceKl`: top-`vocabSize` corpus vocab (count
    * desc, token asc), `<unk>` normalization, per-token micro-nat log
    * difference scaled by the source count. Returns
    * (source, n_toks, kl_micro_scaled, kl_micro_per_tok).
    */
  def sourceKl(docs: Seq[(String, String)],
               vocabSize: Int): Seq[(String, Long, Long, Long)] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    def lpm(cb: Long, cu: Long, v: Long): Long =
      Math.round(StrictMath.log((cb + 1.0d) / (cu.toDouble + v.toDouble)) * 1e6d)

    val stream = docs.flatMap { case (src, t) => toks(t).map(src -> _) }
    val uniCnt = stream.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val vocab = uniCnt.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(vocabSize).map(_._1).toSet
    val vModel = vocab.size + 1L
    def nrm(t: String): String = if (vocab(t)) t else "<unk>"

    val perSrc = stream.map { case (s, t) => (s, nrm(t)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val corpus = perSrc.groupBy(_._1._2)
      .map { case (t, xs) => t -> xs.valuesIterator.sum }
    val nSrc = perSrc.groupBy(_._1._1)
      .map { case (s, xs) => s -> xs.valuesIterator.sum }
    val nAll = corpus.valuesIterator.sum

    nSrc.toSeq.sortBy(_._1).map { case (src, ns) =>
      val tot = perSrc.iterator.collect { case ((s, t), cs) if s == src =>
        cs * (lpm(cs, ns, vModel) - lpm(corpus(t), nAll, vModel))
      }.sum
      (src, ns, tot, if (ns > 0) tot / ns else 0L)
    }
  }

  // ---- streaming near-dup candidates ---------------------------------------

  /** Sequential `StreamingNearDup`: the candidate-pair SET is arrival-order
    * independent below the bucket cap (two docs sharing a kept band key
    * meet exactly once whichever arrives first), so the oracle is the
    * batch restatement — all unordered pairs sharing ≥ 1 band key whose
    * full-signature agreement reaches minEstPm. Shares the signature/band
    * kernels (like simhashPairs shares simhash64); the pairing is what this
    * restates. Returns (a, b, est_pm), a < b, sorted.
    */
  def streamNearDupPairs(docs: Seq[(Long, String)], n: Int, k: Int,
                         bands: Int, minEstPm: Int): Seq[(Long, Long, Long)] = {
    val rows = k / bands
    val sigs = docs.flatMap { case (id, t) =>
      val s = graft.streaming.StreamingNearDup.sigOfText(t, n, k)
      if (s.isEmpty) None else Some((id, s))
    }.toIndexedSeq.sortBy(_._1)
    val keys: IndexedSeq[Set[Long]] = sigs.map { case (_, s) =>
      (0 until bands).map(b =>
        graft.streaming.StreamingNearDup.bandKeyOf(s, b, rows)).toSet
    }
    (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if keys(i).exists(keys(j))
      m = sigs(i)._2.zip(sigs(j)._2).count { case (x, y) => x == y }
      est = 1000L * m / k
      if est >= minEstPm
    } yield (sigs(i)._1, sigs(j)._1, est)).toSeq.sorted
  }

  // ---- temperature mixture sampling ----------------------------------------

  private def md5Hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Sequential `Dedup.sourceOverlap`: per-source shingle UNION sets via
    * [[shingleSet]], the shared k-min kernel (`Dedup.minhashSig`) per
    * source, and the agreement estimator with the distributed integral
    * arithmetic. Returns sorted (source_a, source_b, n_agree, jaccard_pm)
    * for a < b.
    */
  def sourceOverlapSeq(docs: Seq[(Long, String, String)], n: Int,
                       k: Int): Seq[(String, String, Long, Long)] = {
    val bySource = docs.groupBy(_._3).map { case (src, xs) =>
      src -> xs.iterator.flatMap(d => shingleSet(d._2, n)).toSet
    }
    val sigs = bySource.map { case (src, sh) =>
      src -> graft.ops.Dedup.minhashSig(sh, k)
    }.toSeq.sortBy(_._1)
    for {
      i <- sigs.indices
      j <- (i + 1) until sigs.size
    } yield {
      val agree = sigs(i)._2.zip(sigs(j)._2).count { case (x, y) => x == y }.toLong
      (sigs(i)._1, sigs(j)._1, agree, agree * 1000L / k)
    }
  }

  // ---- winnowing fingerprints ----------------------------------------------

  /** Independent restatement of `TextOps.winnowFps`: every k-gram hash is
    * recomputed FROM SCRATCH (no rolling update) and every window minimum
    * by a direct scan (no deque) — same wrapping base-1000003 polynomial
    * and murmur fmix64 finalizer, so any defect in the distributed
    * kernel's O(1) roll or monotonic-deque logic diverges here. Returns
    * the distinct selected hash values sorted ascending.
    */
  def winnowSeq(text: String, k: Int, w: Int): Seq[Long] = {
    def fmix(x0: Long): Long = {
      var x = x0
      x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
      x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
      x ^= (x >>> 33); x
    }
    val cps = text.codePoints().toArray
    if (cps.length < k) return Seq.empty
    val hs = (0 to cps.length - k).map { i =>
      fmix(cps.slice(i, i + k).foldLeft(0L)((h, c) => h * 1000003L + c))
    }
    val ww = math.min(w, hs.length)
    (0 to hs.length - ww).map(i => hs.slice(i, i + ww).min)
      .distinct.sorted
  }

  /** Sequential `Dedup.winnowNearDup`: fingerprint sets via [[winnowSeq]],
    * fingerprints with document frequency > maxDf dropped, pairs counted
    * over the survivors. Returns sorted (a, b, n_shared).
    */
  def winnowPairs(docs: Seq[(Long, String)], k: Int, w: Int,
                  minShared: Int, maxDf: Int): Seq[(Long, Long, Long)] = {
    val posts = docs.flatMap { case (id, t) => winnowSeq(t, k, w).map(_ -> id) }
    val df = posts.groupBy(_._1).map { case (fp, xs) => fp -> xs.size }
    val kept = posts.filter { case (fp, _) => df(fp) <= maxDf }
    kept.groupBy(_._1).values.toSeq
      .flatMap { xs =>
        val ids = xs.map(_._2).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size)
          yield (ids(i), ids(j))
      }
      .groupBy(identity).map { case ((a, b), xs) => (a, b, xs.size.toLong) }
      .filter(_._3 >= minShared).toSeq.sorted
  }

  /** Sequential `Dedup.exactSubstrSpans` ground truth via a REAL suffix
    * array (Lee et al. 2022's construction, not the engine's stride-1
    * window restatement — the two are proven equivalent in the engine's
    * scaladoc, and this independence is the point of the oracle):
    *
    * 1. intern every token to an int id; concatenate all docs' id streams
    *    with a UNIQUE negative separator id per doc (so no match can bridge
    *    documents, and every suffix comparison terminates);
    * 2. suffix array by direct lexicographic sort, LCP by Kasai;
    * 3. maxmatch(i) = max(lcp[rank(i)], lcp[rank(i)+1]) — the longest
    *    prefix of suffix i occurring elsewhere in the corpus;
    * 4. coverage = ∪ { [i, i+maxmatch(i)) : maxmatch(i) ≥ minLen };
    * 5. per doc, emit maximal contiguous covered runs as
    *    (doc_id, start_tok, end_tok exclusive, len_toks).
    *
    * Tokenization matches the engine's splitToks (space-trim, split on the
    * explicit whitespace class, limit −1).
    */
  def exactSubstrSpans(docs: Seq[(Long, String)],
                       minLen: Int): Seq[(Long, Long, Long, Long)] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    val dict = scala.collection.mutable.HashMap.empty[String, Int]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
    // (docIdx, tokPos) per stream slot; (-1, -1) marks a separator
    val meta = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val docSeq = docs.toIndexedSeq
    docSeq.zipWithIndex.foreach { case ((_, text), d) =>
      val ts = toks(text)
      var p = 0
      while (p < ts.length) {
        ids += dict.getOrElseUpdate(ts(p), dict.size)
        meta += ((d, p))
        p += 1
      }
      ids += -(d + 1) // unique separator, never equal to any token or sep
      meta += ((-1, -1))
    }
    val a = ids.toArray
    val n = a.length
    val sa = Array.range(0, n).sortWith { (x, y) =>
      var i = x; var j = y
      while (i < n && j < n && a(i) == a(j)) { i += 1; j += 1 }
      if (i == n) j != n else if (j == n) false else a(i) < a(j)
    }
    val rank = new Array[Int](n)
    var r = 0
    while (r < n) { rank(sa(r)) = r; r += 1 }
    val lcp = new Array[Int](n) // lcp(r) = LCP(sa(r-1), sa(r)); lcp(0) = 0
    var h = 0
    var i = 0
    while (i < n) {
      val ri = rank(i)
      if (ri > 0) {
        val j = sa(ri - 1)
        while (i + h < n && j + h < n && a(i + h) == a(j + h)) h += 1
        lcp(ri) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    val covered = new Array[Boolean](n)
    i = 0
    while (i < n) {
      val ri = rank(i)
      val m = math.max(lcp(ri), if (ri + 1 < n) lcp(ri + 1) else 0)
      if (m >= minLen) {
        var p = i
        while (p < i + m) { covered(p) = true; p += 1 }
      }
      i += 1
    }
    // separators carry unique ids so no maxmatch ever covers one — runs
    // cannot straddle documents; still, meta guards the doc boundary.
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    i = 0
    while (i < n) {
      if (covered(i) && meta(i)._1 >= 0) {
        val (d, start) = meta(i)
        var j = i
        while (j < n && covered(j) && meta(j)._1 == d) j += 1
        val len = j - i
        out += ((docSeq(d)._1, start.toLong, (start + len).toLong, len.toLong))
        i = j
      } else i += 1
    }
    out.toSeq.sorted
  }

  // ---- link graph / pagerank ----------------------------------------------

  /** Sequential `Graph.linkEdges`: the same md5-keyed derivation
    * (h_j = int32(md5(text || ":" || j)), fanout 1 + h_0 % maxFanout,
    * dst_j = h_j % (doc_id + 1)), self-loops dropped, parallel edges
    * collapsed. Returns sorted (src, dst).
    */
  def linkEdgesSeq(docs: Seq[(Long, String)], maxFanout: Int = 3): Seq[(Long, Long)] =
    docs.flatMap { case (id, text) =>
      val f = 1 + (md5Hex8(text + ":0") % maxFanout).toInt
      (0 until f).map(j => (id, md5Hex8(text + ":" + j) % (id + 1)))
        .filter { case (s, d) => d != s }.distinct
    }.sorted

  /** Sequential `Graph.pageRank`: the identical integer micro-unit contract
    * (integral division everywhere; dangling pool shared equally; edges
    * touching ids outside `nodes` contribute nothing; `seeds` = the
    * TrustRank personalization — restart + dangling mass land on seeds
    * only). Returns sorted (doc_id, rank_micro).
    */
  def pageRankSeq(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 10,
                  dampingPm: Long = 850L, initMicro: Long = 1000000L,
                  seeds: Option[Set[Long]] = None): Seq[(Long, Long)] = {
    val n = nodes.size.toLong
    require(n > 0)
    val nodeSet = nodes.toSet
    val isSeed: Long => Boolean = seeds match {
      case Some(s) => v => s(v)
      case None => _ => true
    }
    val nTeleport = if (seeds.isEmpty) n else nodes.count(isSeed).toLong
    require(nTeleport > 0)
    val live = edges.filter { case (u, v) => nodeSet(u) && nodeSet(v) }
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base =
      if (seeds.isEmpty) (1000L - dampingPm) * initMicro / 1000L
      else (1000L - dampingPm) * initMicro * n / 1000L / nTeleport
    var rank = nodes.map(_ -> initMicro).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.iterator.filterNot(outdeg.contains)
        .map(v => dampingPm * rank(v) / 1000L).sum
      val share = dang / nTeleport
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- live) in(v) += dampingPm * rank(u) / (1000L * outdeg(u))
      rank = nodes.map(v =>
        v -> ((if (isSeed(v)) base + share else 0L) + in(v))).toMap
    }
    nodes.sorted.map(v => (v, rank(v)))
  }

  /** Sequential `Graph.hits`: the identical integer micro-unit contract —
    * per-iteration authority-then-hub in-sums, each L1-normalized to
    * N·initMicro total mass via a BigInt multiply + floor division (the
    * distributed DECIMAL(38,0) arithmetic restated exactly); all-zero sums
    * normalize to all zeros; edges touching ids outside `nodes` contribute
    * nothing. Returns sorted (doc_id, auth_micro, hub_micro).
    */
  def hitsSeq(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 5,
              initMicro: Long = 1000000L): Seq[(Long, Long, Long)] = {
    require(iters >= 1)
    val nodeSet = nodes.toSet
    val live = edges.filter { case (u, v) => nodeSet(u) && nodeSet(v) }
    val totMass = BigInt(nodes.size.toLong) * initMicro
    def normalize(raw: collection.Map[Long, Long]): Map[Long, Long] = {
      val tot = nodes.iterator.map(v => BigInt(raw.getOrElse(v, 0L))).sum
      nodes.map(v => v -> (if (tot > 0)
        (BigInt(raw.getOrElse(v, 0L)) * totMass / tot).toLong else 0L)).toMap
    }
    var hub = nodes.map(_ -> initMicro).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val aRaw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- live) aRaw(v) += hub(u)
      auth = normalize(aRaw)
      val hRaw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- live) hRaw(u) += auth(v)
      hub = normalize(hRaw)
    }
    nodes.sorted.map(v => (v, auth(v), hub(v)))
  }

  /** Sequential `TextOps.mixtureSample(docs, temperatureTargets(docs, α))`:
    * targets via the SHARED `temperatureTargetsSeq` arithmetic (driver-side
    * in both formulations by design), then the mixture-sample floor-of-
    * double chain and the md5 hash-Bernoulli keep restated locally with the
    * distributed expressions' exact operand order. Returns
    * (doc_id, source, mix_ppm, rate_ppm, keep).
    */
  def temperatureMixture(docs: Seq[(Long, String)],
                         alphaPm: Int): Seq[(Long, String, Long, Long, Long)] = {
    val counts = docs.groupBy(_._2).map { case (s, xs) => (s, xs.size.toLong) }.toSeq
    val n = counts.toMap
    val targets = graft.ops.TextOps.temperatureTargetsSeq(counts, alphaPm)
    val tTotal = targets.map { case (s, pm) =>
      math.floor((n(s) * 1000L).toDouble / pm).toLong
    }.min
    val rates = targets.map { case (s, pm) =>
      val keepS = math.floor((tTotal * pm).toDouble / 1000.0d).toLong
      s -> math.min(1000000L,
        math.floor((keepS * 1000000L).toDouble / n(s)).toLong)
    }.toMap
    docs.map { case (id, s) =>
      val mix = md5Hex8("mix:" + id) % 1000000L
      val rate = rates(s)
      (id, s, mix, rate, if (mix < rate) 1L else 0L)
    }
  }

  // ---- BM25 retrieval -----------------------------------------------------

  /** Sequential `Retrieval.bm25TopK`: same tokens, same distinct-query-terms
    * contract, the BM25 term formula restated locally (idf = ln(1 +
    * (N−df+½)/(df+½)), Lucene tf-norm), each term contribution rounded to
    * micro-nats BEFORE the per-doc sum, ranking (score desc, doc_id asc).
    * Returns (q_id, doc_id, rank, score_micro); docs with zero matching
    * terms (and queries with zero matching docs) emit nothing.
    */
  def bm25TopK(docs: Seq[(Long, String)], queries: Seq[(Long, String)],
               k: Int, k1Pm: Int, bPm: Int): Seq[(Long, Long, Long, Long)] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    val qTerms: Seq[(Long, Seq[String])] =
      queries.map { case (q, text) => q -> toks(text).distinct.toSeq }
    val allTerms = qTerms.flatMap(_._2).toSet

    val docToks = docs.map { case (id, t) => id -> toks(t) }
    val nDocs = docToks.size.toLong
    val sumDl = docToks.iterator.map(_._2.length.toLong).sum
    // per-doc tf over query terms only, and per-term df
    val tf: Map[Long, Map[String, Long]] = docToks.iterator.map { case (id, ts) =>
      id -> ts.iterator.filter(allTerms).toSeq
        .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    }.toMap
    val df: Map[String, Long] = allTerms.iterator
      .map(t => t -> tf.valuesIterator.count(_.contains(t)).toLong)
      .toMap
    val dl: Map[Long, Long] = docToks.map { case (id, ts) => id -> ts.length.toLong }.toMap

    def termMicro(tfc: Long, dfc: Long, dlc: Long): Long = {
      val idf = StrictMath.log(1.0d + (nDocs.toDouble - dfc.toDouble + 0.5d) / (dfc.toDouble + 0.5d))
      val k1 = k1Pm.toDouble / 1000.0d
      val b = bPm.toDouble / 1000.0d
      val avgdl = sumDl.toDouble / nDocs.toDouble
      val norm = (tfc.toDouble * (k1 + 1.0d)) /
        (tfc.toDouble + k1 * (1.0d - b + b * (dlc.toDouble / avgdl)))
      Math.round(idf * norm * 1e6d)
    }

    qTerms.flatMap { case (q, terms) =>
      val hits = docToks.iterator.collect {
        case (id, _) if terms.exists(t => tf(id).contains(t)) =>
          val s = terms.iterator.flatMap(t =>
            tf(id).get(t).map(c => termMicro(c, df(t), dl(id)))).sum
          (id, s)
      }.toSeq
      hits.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s), i) => (q, id, (i + 1).toLong, s)
      }
    }
  }

  // ---- mojibake repair --------------------------------------------------------

  /** Sequential `TextOps.mojibakeRepair`, restated INDEPENDENTLY through the
    * JDK's windows-1252 charset coders instead of the op's hand-written
    * reverse map: strict CP1252 encode → strict UTF-8 decode, whole-string
    * validity required, ≤ 2 rounds. (The two formulations agree on all text
    * free of raw C1 control characters U+0080–U+009F — which no real or
    * gate corpus contains.) Returns
    * (doc_id, changed, n_chars_before, n_chars_after, text_md5) with char
    * counts as CODE POINTS, mirroring Spark's `length`.
    */
  def fixMojibake(docs: Seq[(Long, String)]): Seq[(Long, Boolean, Long, Long, String)] = {
    def round(s: String): String = {
      if (s.forall(_ < 0x80)) return null
      try {
        val bytes = java.nio.charset.Charset.forName("windows-1252")
          .newEncoder().encode(java.nio.CharBuffer.wrap(s))
        val out = java.nio.charset.StandardCharsets.UTF_8
          .newDecoder().decode(bytes).toString
        if (out == s) null else out
      } catch { case _: java.nio.charset.CharacterCodingException => null }
    }
    def fix(s: String): String = {
      val r1 = round(s)
      if (r1 == null) return s
      val r2 = round(r1)
      if (r2 == null) r1 else r2
    }
    docs.map { case (id, t) =>
      val f = fix(t)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, f != t, t.codePointCount(0, t.length).toLong,
        f.codePointCount(0, f.length).toLong, hex)
    }
  }

  // ---- DSIR importance weights ----------------------------------------------

  /** Sequential `TextOps.dsirWeights`: adjacent-token bigram features, md5
    * first-8-hex-digit bucket hash mod nBuckets, Laplace-smoothed target/raw
    * log-ratio per feature rounded to micro-nats before the per-doc sum.
    * Returns (doc_id, n_feats, dsir_micro, dsir_micro_per_feat).
    */
  def dsirWeights(docs: Seq[(Long, String)], targets: Set[Long],
                  nBuckets: Int): Seq[(Long, Long, Long, Long)] = {
    def toks(text: String): Array[String] = {
      var i0 = 0; var i1 = text.length
      while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
      while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
      val t = text.substring(i0, i1)
      if (t.isEmpty) Array.empty[String]
      else t.split("[ \\t\\n\\x0B\\f\\r]+", -1)
    }
    def bucketOf(feat: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(feat.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % nBuckets
    }
    def lpm(cb: Long, cu: Long, v: Long): Long =
      Math.round(StrictMath.log((cb + 1.0d) / (cu.toDouble + v.toDouble)) * 1e6d)

    val docFeats = docs.map { case (id, t) =>
      val ts = toks(t)
      (id, ts.zip(ts.drop(1)).map { case (a, b) => bucketOf(a + " " + b) })
    }
    val rCnt = collection.mutable.Map.empty[Long, Long]
    val tCnt = collection.mutable.Map.empty[Long, Long]
    docFeats.foreach { case (id, bs) =>
      bs.foreach { b =>
        rCnt(b) = rCnt.getOrElse(b, 0L) + 1
        if (targets(id)) tCnt(b) = tCnt.getOrElse(b, 0L) + 1
      }
    }
    val rTot = rCnt.valuesIterator.sum
    val tTot = tCnt.valuesIterator.sum
    docFeats.map { case (id, bs) =>
      val w = bs.iterator.map { b =>
        lpm(tCnt.getOrElse(b, 0L), tTot, nBuckets.toLong) -
          lpm(rCnt.getOrElse(b, 0L), rTot, nBuckets.toLong)
      }.sum
      val nf = bs.length.toLong
      (id, nf, w, if (nf > 0) w / nf else 0L)
    }
  }

  // ---- sequence packing ----------------------------------------------------

  /** Whitespace token count mirroring `TextOps.tokenCount` (trim ASCII
    * spaces, split `\s+` keeping trailing empties, blank → 0).
    */
  def wsTokenCount(text: String): Int = {
    var i0 = 0; var i1 = text.length
    while (i0 < i1 && text.charAt(i0) == ' ') i0 += 1
    while (i1 > i0 && text.charAt(i1 - 1) == ' ') i1 -= 1
    val t = text.substring(i0, i1)
    if (t.isEmpty) 0 else t.split("[ \\t\\n\\x0B\\f\\r]+", -1).length
  }

  /** Sequential `Packing.packSequences`: best-fit-decreasing inside
    * xxhash64-assigned buckets, restated with a plain linear best-fit scan
    * (no TreeMap). Returns (doc_id, n_tokens, bucket, seq_id, pos).
    */
  def packSequences(docs: Seq[(Long, String)], capacity: Int,
      nBuckets: Int): Seq[(Long, Long, Long, Long, Long)] =
    packItemsSeq(docs.map { case (id, t) => (id, wsTokenCount(t)) },
      capacity, nBuckets)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Sequential curated-manifest input: exact-dedup keepers (min doc_id
    * per content hash) passing the `>= minTokens` quality gate — mirrors
    * `Dedup.exact` keepers + `TextOps.tokenCount` as composed by
    * `q_training_manifest`.
    */
  def curatedDocs(docs: Seq[(Long, String)], minTokens: Int): Seq[(Long, String)] = {
    val keep = docs.groupBy(d => md5hex(d._2)).values.map(_.map(_._1).min).toSet
    docs.filter(d => keep(d._1) && wsTokenCount(d._2) >= minTokens)
  }

  /** Sequential token-window chunk metadata mirroring `TextOps.chunkDocs`:
    * (item_id = doc_id·10^6 + chunk_no, window token count).
    */
  def chunkItems(docs: Seq[(Long, String)], maxTokens: Int,
      overlap: Int): Seq[(Long, Int)] = {
    val stride = maxTokens - overlap
    docs.flatMap { case (id, t) =>
      val n = wsTokenCount(t)
      if (n == 0) Seq.empty
      else {
        val nChunks = math.max(1,
          math.floor((n - overlap + stride - 1).toDouble / stride).toInt)
        (0 until nChunks).map { i =>
          val len = math.min(maxTokens, n - i * stride)
          (id * 1000000L + i, len)
        }
      }
    }
  }

  /** Sequential `Packing.packItems` over precomputed metadata. */
  def packItemsSeq(items: Seq[(Long, Int)], capacity: Int,
      nBuckets: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val meta = items
      .filter { case (_, nt) => nt > 0 && nt <= capacity }
      .map { case (id, nt) =>
        val h = XxHash64Function.hash(
          UTF8String.fromString(s"pack:$id"), StringType, 42L)
        val bucket = (((h % nBuckets) + nBuckets) % nBuckets).toInt
        (id, nt, bucket)
      }
    meta.groupBy(_._3).toSeq.sortBy(_._1).flatMap { case (bucket, ds) =>
      val sorted = ds.map { case (id, nt, _) => (id, nt) }
        .sortBy { case (id, nt) => (-nt, id) }
      // open sequences: (seqNo -> (remaining, nextPos))
      val open = scala.collection.mutable.LinkedHashMap[Int, (Int, Int)]()
      var nextSeq = 0
      sorted.map { case (id, nt) =>
        // best fit: smallest remaining >= nt, ties to lowest seqNo
        var best = -1; var bestRem = Int.MaxValue
        for ((s, (rem, _)) <- open if rem >= nt && rem < bestRem) {
          best = s; bestRem = rem
        }
        val (seqNo, pos) =
          if (best >= 0) { val (rem, p) = open(best); open(best) = (rem - nt, p + 1); (best, p) }
          else { val s = nextSeq; nextSeq += 1; open(s) = (capacity - nt, 1); (s, 0) }
        (id, nt.toLong, bucket.toLong,
          bucket.toLong * 1000000L + seqNo, pos.toLong)
      }
    }
  }

  /** Sequential `Multimodal.frameSample`: same frame slicing, md5, stub
    * decode and micro-unit pooling over the synthetic corpus, restated as a
    * flat loop. Returns (doc_id, media_ref, n_frames, frame_no, frame_md5,
    * pooled_micro).
    */
  def mediaFrames(spec: CorpusGen.Spec, frameBytes: Int, stride: Int,
                  maxFrames: Int, poolDim: Int)
      : Iterator[(String, String, Int, Int, String, Long)] = {
    val decoder = new Multimodal.StubDecoder
    CorpusGen.genAll(spec).flatMap { d =>
      d.spans.filter(_.media_ref.nonEmpty).iterator.flatMap { s =>
        val content = Multimodal.syntheticContent(s.media_ref)
        val total = content.length / frameBytes
        Range(0, total, stride).take(maxFrames).map { f =>
          val frame = java.util.Arrays.copyOfRange(
            content, f * frameBytes, (f + 1) * frameBytes)
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(frame).map("%02x".format(_)).mkString
          (d.doc_id, s.media_ref, total, f, md5,
            Multimodal.resizePool(decoder.decode(frame), poolDim).sum)
        }
      }
    }
  }

  /** Sequential `Multimodal.phashNearDup` over the synthetic corpus plus the
    * SAME deterministic perturbed plants as `Multimodal.perturbedAssets`:
    * brute-force all-pairs Hamming over the per-asset [[Multimodal.phash64]]
    * values (the shared hash kernel, like `simhashPairs` shares
    * `Dedup.simhash64` — the banding/join machinery is what this restates
    * independently), with the distributed op's maxBucket contract mirrored
    * the standard way. Returns (a, b, hamming) with a < b.
    */
  def phashPairs(spec: CorpusGen.Spec, flips: Int, mod: Int,
                 maxHamming: Int, maxBucket: Int = 10000,
                 bandsPerKey: Int = 1): Seq[(String, String, Long)] = {
    val baseRefs = CorpusGen.genAll(spec)
      .flatMap(_.spans.iterator.map(_.media_ref).filter(_.nonEmpty))
      .toSeq.distinct
    def perturb(c: Array[Byte]): Array[Byte] = {
      val x = c.clone()
      var j = 0
      while (j < flips && x.length > 0) {
        val p = j * 31 % x.length
        x(p) = (x(p) + 1).toByte
        j += 1
      }
      x
    }
    // IndexedSeq: the all-pairs loop below does O(n^2) positional reads
    val assets: IndexedSeq[(String, Long)] = (baseRefs.map(r =>
        r -> Multimodal.phash64(Multimodal.syntheticContent(r))) ++
      baseRefs.filter(r => math.floorMod(MurmurHash3.stringHash(r), mod) == 0)
        .map(r => (r + "~p") ->
          Multimodal.phash64(perturb(Multimodal.syntheticContent(r))))
      ).sortBy(_._1).toIndexedSeq
    // identical multi-index layout as the engine (shared combo builder)
    val width = 64 / (maxHamming + bandsPerKey)
    val mask = (1L << width) - 1
    val combos = Multimodal.bandCombos(maxHamming, bandsPerKey)
    def bandKeys(h: Long): Seq[(Int, Long)] =
      combos.map { case (id, bs) =>
        val key = bs.zipWithIndex.map { case (b, i) =>
          ((h >>> (b * width)) & mask) << (i * width)
        }.reduce(_ | _)
        (id, key)
      }
    val bucketSize = scala.collection.mutable.Map.empty[(Int, Long), Int]
    assets.foreach { case (_, h) =>
      bandKeys(h).foreach(k => bucketSize(k) = bucketSize.getOrElse(k, 0) + 1)
    }
    def meetsInKeptBucket(h1: Long, h2: Long): Boolean = {
      val k2 = bandKeys(h2).toMap
      bandKeys(h1).exists { case (id, k) =>
        k2(id) == k && bucketSize((id, k)) <= maxBucket
      }
    }
    (for {
      i <- assets.indices.iterator
      j <- (i + 1) until assets.length
      h = java.lang.Long.bitCount(assets(i)._2 ^ assets(j)._2)
      if h <= maxHamming && meetsInKeptBucket(assets(i)._2, assets(j)._2)
    } yield (assets(i)._1, assets(j)._1, h.toLong)).toSeq.sorted
  }

  /** Sequential `Multimodal` features over the synthetic corpus: every
    * media-bearing span → (doc_id, media_ref, n_bytes, content_h64).
    */
  def mediaFeatures(spec: CorpusGen.Spec): Iterator[(String, String, Long, Long)] =
    CorpusGen.genAll(spec).flatMap { d =>
      d.spans.filter(_.media_ref.nonEmpty).map { s =>
        val content = Multimodal.syntheticContent(s.media_ref)
        val h64 = (MurmurHash3.bytesHash(content).toLong << 32) |
          (content.length.toLong & 0xffffffffL)
        (d.doc_id, s.media_ref, content.length.toLong, h64)
      }
    }
}

/** Materializes the sequential ops oracles as golden parquet under
  * data/golden_ops/<sf>/<name> (the same pattern as Corpus.ensureGolden);
  * the driver's oracle SQL reads them via read_parquet().
  */
object OpsGolden {

  def path(sf: String, name: String): String = s"${Corpus.Root}/golden_ops/$sf/$name"

  private def exists(p: String): Boolean = Files.exists(Paths.get(p, "_SUCCESS"))

  private val names = Seq("ngram", "minhash", "simhash", "clusters", "ann_brute",
    "ann_lsh", "ann_ivf", "ann_ivf_km", "ann_q8", "embdup", "media",
    "decontam", "packing", "chunkpack", "manifest", "semdedup", "bpe", "lm",
    "bpeenc", "nb", "dsir", "moji", "frames", "srckl", "bm25", "phash",
    "semdecon", "tempmix", "rproj", "cdc", "wpm", "wpenc", "streamnd",
    "incnd", "pagerank", "trustrank", "hits", "sblm", "winnow", "srcover",
    "ugv", "ugenc", "exactsub", "ann_ivfpq", "ann_ivfpq_rr", "entropy",
    "phash_mih")

  /** Idempotently generate all ops goldens for one testdata dir. */
  def ensure(spark: SparkSession, sfDir: String): Unit = synchronized {
    val sf = Corpus.sfName(sfDir)
    if (names.forall(n => exists(path(sf, n)))) return
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)

    def write[T <: Product : org.apache.spark.sql.Encoder](
        name: String, rows: Seq[T], cols: Seq[String]): Unit =
      spark.createDataset(rows).toDF(cols: _*)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path(sf, name))

    write("ngram", OpsOracle.ngramPairs(docs, n = 3, minJaccardPm = 200),
      Seq("a", "b", "n_inter", "n_a", "n_b", "jaccard_pm"))
    // computed once, feeds both the pair golden and the cluster golden
    val mhPairs = OpsOracle.minhashPairs(docs, n = 3, k = 64, bands = 16,
      minJaccardPm = 200)
    write("minhash", mhPairs, Seq("a", "b", "jaccard_pm"))
    write("clusters",
      OpsOracle.clusterAssign(docs.map(_._1),
        mhPairs.map { case (a, b, _) => (a, b) }),
      Seq("doc_id", "cluster_id", "n_members", "is_keep"))
    write("simhash",
      OpsOracle.simhashPairs(docs, maxHamming = 7)
        .map { case (a, b, h) => (a, b, h.toLong) },
      Seq("a", "b", "hamming"))
    write("winnow",
      OpsOracle.winnowPairs(docs, k = 8, w = 16, minShared = 2, maxDf = 32),
      Seq("a", "b", "n_shared"))
    // suffix-array ExactSubstr spans — the engine recomputes them via the
    // equivalent stride-1 window construction (Dedup.exactSubstrSpans)
    write("exactsub",
      OpsOracle.exactSubstrSpans(docs, minLen = 20),
      Seq("doc_id", "start_tok", "end_tok", "len_toks"))
    write("srcover", {
      val srcs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source").as[(Long, String)].collect().toMap
      OpsOracle.sourceOverlapSeq(
        docs.map { case (id, t) => (id, t, srcs(id)) }, n = 3, k = 64)
    }, Seq("a", "b", "n_agree", "jaccard_pm"))
    // batch (doc_id % 3 != 0) near-dedups against the committed-index
    // signatures of the rest — same split as the exact incremental gate
    write("incnd",
      OpsOracle.incrementalNearNew(
        batch = docs.filter(_._1 % 3 != 0), index = docs.filter(_._1 % 3 == 0),
        n = 3, k = 64, bands = 16, minAgreePm = 500),
      Seq("doc_id", "match_id", "agree_pm", "is_new"))
    write("ann_brute",
      OpsOracle.bruteTopK(embs, nQueries = 20, k = 5)
        .map { case (q, n, r, s) => (q, n, r.toLong, math.floor(s * 1000).toLong) },
      Seq("q_id", "n_id", "rank", "score_pm"))
    write("ann_lsh",
      OpsOracle.lshTopK(embs, nQueries = 20, k = 5, nPlanes = 8, seed = 42)
        .map { case (q, n, r, s) => (q, n, r.toLong, math.floor(s * 1000).toLong) },
      Seq("q_id", "n_id", "rank", "score_pm"))
    write("ann_ivf",
      OpsOracle.ivfTopK(embs, nQueries = 20, k = 5, nCells = 32, nProbe = 4)
        .map { case (q, n, r, s) => (q, n, r.toLong, math.floor(s * 1000).toLong) },
      Seq("q_id", "n_id", "rank", "score_pm"))
    write("ann_ivf_km",
      OpsOracle.ivfTopK(embs, nQueries = 20, k = 5, nCells = 32, nProbe = 4,
          trainIters = 3)
        .map { case (q, n, r, s) => (q, n, r.toLong, math.floor(s * 1000).toLong) },
      Seq("q_id", "n_id", "rank", "score_pm"))
    write("ann_ivfpq",
      OpsOracle.ivfpqTopK(embs, nQueries = 20, k = 5, nCells = 32, nProbe = 4,
          m = 8, ks = 16, pqIters = 2)
        .map { case (q, n, r, s) => (q, n, r.toLong, math.floor(s * 1000).toLong) },
      Seq("q_id", "n_id", "rank", "score_pm"))
    write("ann_ivfpq_rr",
      OpsOracle.ivfpqRerankTopK(embs, nQueries = 20, k = 5, nCells = 32,
          nProbe = 4, m = 8, ks = 16, pqIters = 2, shortlistFactor = 4)
        .map { case (q, n, r, s) => (q, n, r.toLong, math.floor(s * 1000).toLong) },
      Seq("q_id", "n_id", "rank", "score_pm"))
    write("ann_q8",
      OpsOracle.quantizedTopK(embs, nQueries = 20, k = 5)
        .map { case (q, n, r, s) => (q, n, r.toLong, s) },
      Seq("q_id", "n_id", "rank", "score_int"))
    write("embdup",
      OpsOracle.cosineNearDup(embs ++ OpsOracle.perturbed(embs, n = 20),
          minCosinePm = 990, nPlanes = 10, seed = 42)
        .map { case (a, b, s) => (a, b, math.floor(s * 1000).toLong) },
      Seq("a", "b", "score_pm"))
    // cluster-then-dedup over the SAME planted near-dups as embdup, so the
    // semantic-dup relation has known true positives (perturbed copies)
    write("semdedup",
      OpsOracle.semanticDedup(embs ++ OpsOracle.perturbed(embs, n = 20),
        minCosinePm = 990, nCells = 32, trainIters = 2),
      Seq("vec_id", "cell", "dup_of", "keep"))
    write("media",
      OpsOracle.mediaFeatures(CorpusGen.specFor(sf)).toSeq,
      Seq("doc_id", "media_ref", "n_bytes", "content_h64"))
    write("frames",
      OpsOracle.mediaFrames(CorpusGen.specFor(sf), frameBytes = 64,
        stride = 2, maxFrames = 8, poolDim = 4).toSeq,
      Seq("doc_id", "media_ref", "n_frames", "frame_no", "frame_md5",
        "pooled_micro"))
    write("bpe",
      OpsOracle.bpeMerges(docs, nMerges = 40, maxVocab = 1 << 16),
      Seq("rank", "left", "right", "n_occ"))
    write("lm",
      OpsOracle.lmScore(docs, vocabSize = 1 << 14, maxBigrams = 1 << 16),
      Seq("doc_id", "n_trans", "lp_micro_tot", "lp_micro_per_tok"))
    write("entropy",
      OpsOracle.tokenEntropySeq(docs),
      Seq("doc_id", "n_toks", "n_types", "h_micro_tot", "h_micro_per_tok"))
    // trigram stupid-backoff LM: tight caps (vocab 16 of ~31 tokens, 1024
    // of ~5k normalized trigrams, 128 of ~300 bigrams) so ALL THREE
    // backoff levels fire at the gate scale
    write("sblm",
      OpsOracle.backoffLmSeq(docs, vocabSize = 16, maxTrigrams = 1024,
        maxBigrams = 128, alphaPm = 400),
      Seq("doc_id", "n_trans", "lp_micro_tot", "lp_micro_per_tok"))
    // WordPiece inference with the SAME vocab the wpm golden's trainer
    // derivation builds (alphabet + merge tokens)
    write("wpenc",
      OpsOracle.wordpieceEncode(docs,
        OpsOracle.wordpieceVocab(docs, nMerges = 40, maxVocab = 1 << 16)),
      Seq("doc_id", "n_words", "n_pieces", "pieces_md5"))
    // Unigram-LM trainer + inference with the SAME trained vocab
    val ugVocab = OpsOracle.unigramVocabSeq(docs, vocabSize = 120,
      maxPieceLen = 5, seedSize = 400, emIters = 3, maxVocab = 1 << 16)
    write("ugv", ugVocab, Seq("rank", "piece", "n_occ"))
    write("ugenc",
      OpsOracle.unigramEncodeSeq(docs, ugVocab.map(t => (t._2, t._3))),
      Seq("doc_id", "n_words", "n_pieces", "pieces_md5"))
    // inference with the SAME merge list the bpe golden trains
    write("bpeenc",
      OpsOracle.bpeEncode(docs,
        OpsOracle.bpeMerges(docs, nMerges = 40, maxVocab = 1 << 16)
          .map { case (_, l, r, _) => (l, r) }),
      Seq("doc_id", "n_words", "n_pieces", "pieces_md5"))
    // per-source KL drift over the same (source, text) pairs the query reads
    write("srckl", {
      val srcDocs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("source", "text").as[(String, String)].collect().toSeq.sorted
      OpsOracle.sourceKl(srcDocs, vocabSize = 1 << 14)
    }, Seq("source", "n_toks", "kl_micro_scaled", "kl_micro_per_tok"))
    // Naive Bayes quality classifier: seed labels = every 3rd doc, positive
    // = source 'src0' — the SAME derivation as SparkEntry's
    // q_doc_nb_quality seed side
    write("nb", {
      val srcs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source").as[(Long, String)].collect().toMap
      OpsOracle.nbScore(docs,
        docs.collect { case (id, _) if id % 3 == 0 =>
          id -> (if (srcs(id) == "src0") 1 else 0)
        }.toMap,
        vocabSize = 1 << 14)
    }, Seq("doc_id", "n_toks", "lp1_micro", "lp0_micro", "margin_micro",
      "nb_label"))
    // mojibake repair over the SAME deterministic corruption as SparkEntry's
    // q_doc_mojibake: UTF-8-as-CP1252 plants on %3/%7 docs, a genuine (not
    // mojibake) accent on %5 docs that must stay untouched and must also
    // veto repair where both land on one doc
    write("moji", {
      val planted = docs.map { case (id, t) =>
        var x = t
        if (id % 3 == 0) x = x.replace(" table ", " tÃ¡ble ")
        if (id % 7 == 0) x = x.replace(" row ", " rowâ€™s ")
        if (id % 5 == 0) x = x.replace(" fast ", " fást ")
        (id, x)
      }
      OpsOracle.fixMojibake(planted)
    }, Seq("doc_id", "changed", "n_chars_before", "n_chars_after", "text_md5"))
    // DSIR importance weights toward the src0 distribution — the SAME
    // target derivation as SparkEntry's q_doc_dsir
    write("dsir", {
      val srcs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source").as[(Long, String)].collect().toMap
      OpsOracle.dsirWeights(docs,
        docs.iterator.map(_._1).filter(id => srcs(id) == "src0").toSet,
        nBuckets = 1 << 12)
    }, Seq("doc_id", "n_feats", "dsir_micro", "dsir_micro_per_feat"))
    // planted benchmark = mid-document excerpts of every 97th doc — the
    // SAME derivation as SparkEntry's q_decontam bench side
    write("decontam",
      OpsOracle.decontaminate(docs,
        docs.filter(_._1 % 97 == 0).map(d => OpsOracle.cpSubstring(d._2, 51, 400)),
        n = 5),
      Seq("doc_id", "n_overlap", "contaminated"))
    // integer PageRank over the deterministic md5-keyed link graph — the
    // SAME derivation as SparkEntry's q_pagerank edge side
    write("pagerank",
      OpsOracle.pageRankSeq(docs.map(_._1), OpsOracle.linkEdgesSeq(docs),
        iters = 10, dampingPm = 850L, initMicro = 1000000L),
      Seq("doc_id", "rank_micro"))
    // TrustRank: restart + dangling mass personalized to the src0 seed
    // docs — the SAME seed derivation as SparkEntry's q_trustrank
    write("trustrank", {
      val srcs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source").as[(Long, String)].collect().toMap
      OpsOracle.pageRankSeq(docs.map(_._1), OpsOracle.linkEdgesSeq(docs),
        iters = 10, dampingPm = 850L, initMicro = 1000000L,
        seeds = Some(docs.iterator.map(_._1).filter(id => srcs(id) == "src0").toSet))
    }, Seq("doc_id", "rank_micro"))
    // HITS hubs/authorities over the SAME edge derivation
    write("hits",
      OpsOracle.hitsSeq(docs.map(_._1), OpsOracle.linkEdgesSeq(docs),
        iters = 5, initMicro = 1000000L),
      Seq("doc_id", "auth_micro", "hub_micro"))
    write("packing",
      OpsOracle.packSequences(docs, capacity = 128, nBuckets = 16),
      Seq("doc_id", "n_tokens", "bucket", "seq_id", "pos"))
    // composed pipeline: 64/8 token-window chunks → 128-token sequences
    write("chunkpack",
      OpsOracle.packItemsSeq(
        OpsOracle.chunkItems(docs, maxTokens = 64, overlap = 8),
        capacity = 128, nBuckets = 16),
      Seq("item_id", "n_tokens", "bucket", "seq_id", "pos"))
    // full curation pipeline: dedup keepers → token gate → chunk → pack
    // (the shard-manifest tail is SQL arithmetic over these rows)
    write("manifest",
      OpsOracle.packItemsSeq(
        OpsOracle.chunkItems(OpsOracle.curatedDocs(docs, minTokens = 30),
          maxTokens = 64, overlap = 8),
        capacity = 128, nBuckets = 16),
      Seq("item_id", "n_tokens", "bucket", "seq_id", "pos"))
    // streaming near-dup candidate pairs (order-independent pair set)
    write("streamnd",
      OpsOracle.streamNearDupPairs(docs, n = 3, k = 16, bands = 4,
        minEstPm = 250),
      Seq("a", "b", "est_pm"))
    // WordPiece trainer: likelihood-scored merges, restated independently
    write("wpm",
      OpsOracle.wordpieceMerges(docs, nMerges = 40, maxVocab = 1 << 16),
      Seq("rank", "left", "right", "n_occ", "l_cnt", "r_cnt"))
    // content-defined chunking: shared gear kernel, plumbing restated
    write("cdc", docs.flatMap { case (id, t) =>
      graft.ops.TextOps.cdcChunksStr(t).zipWithIndex.map { case (c, i) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (id, i.toLong, c.length.toLong, md5)
      }
    }, Seq("doc_id", "chunk_no", "n_chars", "chunk_md5"))
    // JL ±1 random projection to 8 dims, exploded to scalar rows
    write("rproj",
      OpsOracle.randomProject(embs, outDim = 8, seed = 42)
        .flatMap { case (id, p) =>
          p.iterator.zipWithIndex.map { case (v, j) => (id, j.toLong, v) } },
      Seq("vec_id", "dim", "out_micro"))
    // temperature (α=0.3) mixture over the gate corpus's (doc_id, source)
    write("tempmix", {
      val srcDocs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "source").as[(Long, String)].collect().toSeq.sortBy(_._1)
      OpsOracle.temperatureMixture(srcDocs, alphaPm = 300)
    }, Seq("doc_id", "source", "mix_ppm", "rate_ppm", "keep"))
    // semantic decontamination: eval set = perturbed copies of the first 15
    // corpus vectors (planted leaks) — the SAME derivation as SparkEntry's
    // q_semantic_decontam eval side
    write("semdecon",
      OpsOracle.semanticDecontam(embs,
        OpsOracle.perturbed(embs, n = 15), minCosinePm = 990),
      Seq("vec_id", "eval_id", "score_pm"))
    // perceptual-hash media near-dup over corpus assets + perturbed plants
    write("phash",
      OpsOracle.phashPairs(CorpusGen.specFor(sf), flips = 2, mod = 7,
        maxHamming = 6),
      Seq("a", "b", "hamming"))
    // multi-index variant (r = 3 bands per key — the corpus-scale layout);
    // at gate scale no bucket overflows under either layout, so the pair
    // SET matches the classic banding, but the code path is the joint-band
    // key machinery end to end
    write("phash_mih",
      OpsOracle.phashPairs(CorpusGen.specFor(sf), flips = 2, mod = 7,
        maxHamming = 6, bandsPerKey = 3),
      Seq("a", "b", "hamming"))
    // BM25 retrieval over the fixed probe set (shared with q_bm25_topk)
    write("bm25",
      OpsOracle.bm25TopK(docs, graft.ops.Retrieval.GateQueries,
        k = 10, k1Pm = 1200, bPm = 750),
      Seq("q_id", "doc_id", "rank", "score_micro"))
  }
}
