package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: bin-pack variable-length documents
  * into fixed token-capacity training sequences so padding waste is
  * minimized (the "packing" step every large-scale pretraining pipeline
  * runs between curation and tokenized shard writing).
  *
  * Algorithm: best-fit-decreasing inside deterministic hash buckets.
  * Each doc is assigned to a bucket by a content-independent hash of its
  * id; within a bucket, docs are sorted by (n_tokens desc, doc_id asc) and
  * placed greedily into the open sequence with the SMALLEST remaining
  * capacity that still fits (ties → lowest sequence number; no fit → new
  * sequence). BFD is a classic ≤ 11/9·OPT + 1 bin-packing heuristic, and
  * the whole procedure is a pure function of the bucket's contents — no
  * ordering dependence on Spark's partitioning, so output is identical at
  * any parallelism.
  *
  * Scale shape: the shuffle carries METADATA only — (doc_id, n_tokens,
  * bucket), 16 bytes a doc, one hash exchange — never text. Packing runs
  * per bucket in `flatMapGroups`; a bucket holds |corpus|/nBuckets metadata
  * rows, so nBuckets is sized to keep a bucket's metadata in executor
  * memory (10M docs/bucket ≈ 160 MB; at 100 TB choose nBuckets so buckets
  * stay a few million docs — packing quality is unaffected because BFD
  * waste is per-sequence, not per-bucket). The in-bucket best-fit lookup is
  * a TreeMap search, O(n log n) per bucket.
  *
  * Docs longer than `capacity` cannot be packed whole and are excluded
  * (real pipelines chunk them first — that is a different operator);
  * blank docs (0 tokens) are excluded too.
  */
object Packing {

  /** Pack docs into sequences of at most `capacity` whitespace tokens.
    * Returns one row per packed doc:
    * (doc_id, n_tokens, bucket, seq_id, pos) where seq_id is globally
    * unique (bucket · 10^6 + per-bucket sequence number) and pos is the
    * doc's placement order inside its sequence.
    */
  def packSequences(docs: DataFrame, capacity: Int = 512,
      nBuckets: Int = 16): DataFrame =
    packItems(
      docs.select(col("doc_id").cast("long").as("item_id"),
        TextOps.tokenCount(col("text")).cast("int").as("n_tokens")),
      capacity, nBuckets)
      .withColumnRenamed("item_id", "doc_id")

  /** The metadata-level entry: pack precomputed (item_id, n_tokens) rows —
    * whole docs, chunks from [[TextOps.chunkDocs]], or any other unit.
    * Same contract as [[packSequences]] with `item_id` in place of
    * `doc_id`.
    */
  def packItems(items: DataFrame, capacity: Int,
      nBuckets: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val meta = items
      .select(col("item_id").cast("long").as("item_id"),
        col("n_tokens").cast("int").as("n_tokens"))
      .where(col("n_tokens") > 0 && col("n_tokens") <= capacity)
      .withColumn("bucket",
        pmod(xxhash64(concat(lit("pack:"), col("item_id").cast("string"))),
          lit(nBuckets.toLong)).cast("int"))
      .as[(Long, Int, Int)]
    meta.groupByKey(_._3)
      .flatMapGroups { (bucket, it) =>
        packBucket(bucket, it.map { case (id, nt, _) => (id, nt) }, capacity)
      }
      .toDF("item_id", "n_tokens", "bucket", "seq_no", "pos")
      .select(col("item_id"), col("n_tokens"), col("bucket"),
        (col("bucket").cast("long") * 1000000L + col("seq_no")).as("seq_id"),
        col("pos"))
  }

  /** Deterministic training-order shard manifest: the global shuffle every
    * pretraining run needs between packing and shard writing, expressed as
    * pure hash arithmetic so the "random" order is reproducible byte-for-
    * byte on any cluster. Each packed sequence (one row per item in
    * [[packItems]] output) is rolled up to (seq_id, n_items, sum_tokens),
    * assigned to a shard by md5 of its id, and given a position inside the
    * shard by md5 order — an effectively-uniform permutation with a total
    * order (md5, then seq_id) so no tie can make two engines disagree.
    *
    * Scale shape: one groupBy(seq_id) rollup of metadata rows, then a
    * row_number window per shard. The per-shard sort is NOT a scale
    * ceiling the way a per-source global sort is: nShards is chosen so a
    * shard is one training file (10k–100k sequences), which makes the
    * window partition exactly the bounded, file-sized sort the shard
    * writer would run anyway (`sortWithinPartitions` before write).
    */
  def shardManifest(packed: DataFrame, nShards: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards >= 1, "nShards >= 1")
    val seqs = packed.groupBy(col("seq_id"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
    val ord = md5(concat(lit("shard:"), col("seq_id").cast("string"))
      .cast("binary"))
    seqs.withColumn("ord", ord)
      .withColumn("shard",
        (conv(substring(col("ord"), 1, 8), 16, 10).cast("long")
          % nShards).cast("long"))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("ord"), col("seq_id")))
        .cast("long"))
      .select(col("seq_id"), col("n_items"), col("sum_tokens"),
        col("shard"), col("shard_pos"))
  }

  /** Best-fit-decreasing over one bucket's (doc_id, n_tokens) metadata.
    * Pure and deterministic: same multiset in → same placements out.
    * Emits (doc_id, n_tokens, bucket, seq_no, pos).
    */
  private[ops] def packBucket(bucket: Int, it: Iterator[(Long, Int)],
      capacity: Int): Iterator[(Long, Int, Int, Int, Int)] = {
    val ds = it.toArray
    java.util.Arrays.sort(ds, Ordering.by[(Long, Int), (Int, Long)] {
      case (id, nt) => (-nt, id)
    })
    // open sequences keyed (remaining, seqNo) -> next pos: the smallest
    // remaining ≥ size, ties to the lowest seqNo — ceilingKey in O(log n)
    val open = new java.util.TreeMap[(Int, Int), Int](
      implicitly[Ordering[(Int, Int)]])
    var nextSeq = 0
    val out = Array.newBuilder[(Long, Int, Int, Int, Int)]
    for ((id, nt) <- ds) {
      val k = open.ceilingKey((nt, Int.MinValue))
      val (seqNo, pos, remaining) =
        if (k != null) { val p = open.remove(k); (k._2, p, k._1) }
        else { val s = nextSeq; nextSeq += 1; (s, 0, capacity) }
      out += ((id, nt, bucket, seqNo, pos))
      if (remaining - nt > 0) open.put((remaining - nt, seqNo), pos + 1)
    }
    out.result().iterator
  }
}
