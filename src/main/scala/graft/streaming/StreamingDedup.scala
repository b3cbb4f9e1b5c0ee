package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Stateful streaming exact-dedup: admit a document into the corpus only if
  * its content has never been seen in ANY earlier micro-batch (ingest-time
  * dedup — the streaming complement of `ops.Dedup.exact`).
  *
  * `groupByKey(content-hash)` + `flatMapGroupsWithState` keeps one tiny state
  * entry (the keeper's doc_id) per distinct content hash in the streaming
  * state store. Scale notes: state is hash-partitioned across
  * `spark.sql.shuffle.partitions` state-store partitions and the per-key
  * payload is 16 bytes of key + one long, so 10^9 distinct documents is
  * ~10s of GB of state — use the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`) rather than the
  * in-memory default at that size, and `GroupStateTimeout.ProcessingTimeTimeout`
  * if the dedup horizon is bounded (e.g. 30-day crawl windows). Keying by a
  * 128-bit content hash instead of the full text keeps shuffle and state
  * rows fixed-width (collision probability ~n^2/2^128 — negligible at 10^12).
  */
object StreamingDedup {

  final case class DocIn(doc_id: Long, text: String)
  final case class Admitted(content_md5: String, doc_id: Long, text: String)
  // public: the state Encoder's generated code instantiates it reflectively
  final case class Seen(keepId: Long)

  /** 128-bit content key (hex md5 of UTF-8 text, same key as `Dedup.exact`). */
  def contentMd5(text: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** First-seen filter over a (possibly streaming) Dataset: one output row
    * per distinct content, the first batch's minimum doc_id winning; later
    * occurrences (same batch or any later batch) are dropped via state.
    *
    * `ttl` bounds the dedup horizon: with e.g. `Some("30 days")` a content
    * hash unseen for that long is evicted (processing-time timeout), so
    * state is O(distinct docs within the horizon) instead of growing
    * monotonically forever — mandatory for an unbounded crawl (and pair it
    * with the RocksDB state store provider; see class doc). `None` keeps
    * exact forever-dedup for bounded ingests. NOTE: use the TTL only with a
    * continuous/processing-time trigger — `Trigger.AvailableNow` does not
    * terminate while processing-time timers are pending, so a TTL'd
    * drain-and-stop run hangs in awaitTermination.
    */
  def firstSeen(docs: Dataset[DocIn],
                ttl: Option[String] = None): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs.groupByKey(d => contentMd5(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (key: String, rows: Iterator[DocIn], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove() // horizon passed: forget this content hash
            Iterator.empty
          } else if (state.exists) {
            // seen: refresh the horizon (sliding TTL since last occurrence)
            ttl.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            var keep: DocIn = null
            while (rows.hasNext) {
              val d = rows.next()
              if (keep == null || d.doc_id < keep.doc_id) keep = d
            }
            state.update(Seen(keep.doc_id))
            ttl.foreach(state.setTimeoutDuration)
            Iterator.single(Admitted(key, keep.doc_id, keep.text))
          })
  }

  /** Input schema of the streamed documents table. */
  val inputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType)))

  /** AvailableNow dedup ingest: drain `inputPath`, append only first-seen
    * documents to `outPath` parquet. The streaming checkpoint persists BOTH
    * source offsets and the seen-content state, so a re-run with the same
    * checkpoint admits nothing twice even across restarts, and newly added
    * files are deduped against everything admitted before.
    */
  def ingestDedup(spark: SparkSession, inputPath: String, outPath: String,
                  checkpoint: String, maxFilesPerTrigger: Int = 1,
                  ttl: Option[String] = None): Unit = {
    // AvailableNow does not terminate while processing-time timers are
    // pending, so a TTL'd drain-and-stop run would hang in awaitTermination
    // — the TTL belongs to the continuous entry point below.
    require(ttl.isEmpty,
      "TTL requires a processing-time trigger — use ingestDedupContinuous")
    val q = dedupStream(spark, inputPath, outPath, checkpoint,
      maxFilesPerTrigger, ttl = None)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Continuous (tailing) dedup ingest with an optional state TTL — the
    * long-running-crawl mode. Runs on a processing-time trigger (so
    * `GroupStateTimeout.ProcessingTimeTimeout` timers actually fire and
    * expired content hashes are evicted), and stops once no micro-batch has
    * processed data for `idleStopMs` (a drain-then-stop loop for bounded
    * runs; pass `Long.MaxValue` to tail forever). Returns the number of
    * non-empty micro-batches.
    */
  def ingestDedupContinuous(spark: SparkSession, inputPath: String, outPath: String,
                            checkpoint: String, maxFilesPerTrigger: Int = 1,
                            ttl: Option[String] = None,
                            triggerMs: Long = 500L,
                            idleStopMs: Long = 10000L): Long = {
    val q = dedupStream(spark, inputPath, outPath, checkpoint,
      maxFilesPerTrigger, ttl)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
    drainUntilIdle(q, idleStopMs)
  }

  /** Watch a processing-time-trigger query's progress until no micro-batch
    * has carried data for `idleStopMs`, then stop it. POLLS lastProgress
    * rather than `processAllAvailable()`: with `ProcessingTimeTimeout`
    * timers pending, the engine keeps scheduling timeout-only batches, so
    * the no-new-data condition processAllAvailable waits on never signals
    * and the drain would hang. Returns the number of non-empty batches.
    */
  private[streaming] def drainUntilIdle(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      idleStopMs: Long): Long = {
    var nonEmpty = 0L
    var lastBatch = -1L
    var lastData = System.nanoTime()
    try {
      while (q.isActive && (System.nanoTime() - lastData) / 1000000L < idleStopMs) {
        // pending source data (including a data batch still executing) is
        // activity — stopping here would abort the in-flight commit. Pure
        // timeout-only batches (TTL evictions) are NOT: with a TTL the
        // engine schedules them every trigger forever, so counting them
        // would never go idle.
        if (q.status.isDataAvailable) lastData = System.nanoTime()
        val p = q.lastProgress
        if (p != null && p.batchId > lastBatch) {
          lastBatch = p.batchId
          if (p.numInputRows > 0) {
            nonEmpty += 1
            lastData = System.nanoTime()
          }
        }
        Thread.sleep(100)
      }
    } finally {
      q.stop()
      q.awaitTermination()
    }
    nonEmpty
  }

  private def dedupStream(spark: SparkSession, inputPath: String, outPath: String,
                          checkpoint: String, maxFilesPerTrigger: Int,
                          ttl: Option[String]) = {
    import spark.implicits._
    val stream = spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputPath)
      .as[DocIn]
    firstSeen(stream, ttl).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outPath)
  }
}
