package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Event-time windowed metrics with a watermark — the telemetry complement
  * of the work-queue extraction stream (SURVEY §2.9 correctly maps the
  * reference's Celery progress events to processing-time metrics rows; a
  * crawl at corpus scale additionally wants event-time rollups that tolerate
  * late/out-of-order arrivals while keeping state bounded).
  *
  * Tumbling `windowLen` counts per event_type: append-mode emission once the
  * watermark (max event time − `delay`) passes a window's end, after which
  * that window's state is dropped — state size is O(open windows × types),
  * independent of stream length.
  */
object StreamingMetrics {

  def windowedCounts(events: DataFrame, windowLen: String, delay: String): DataFrame =
    // parquet TIMESTAMP_NTZ → TIMESTAMP (event-time columns must be
    // instant-typed; session TZ is UTC throughout this project)
    events.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"))

  /** AvailableNow ingest of time-ordered event files: closed windows land in
    * `outPath` parquet; the in-flight tail (inside the watermark horizon)
    * stays in state and would emit on the next run with more data.
    */
  def ingest(spark: SparkSession, inputGlob: String, outPath: String,
             checkpoint: String, schema: StructType,
             windowLen: String = "1 day", delay: String = "1 hour",
             maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputGlob)
    val q = windowedCounts(stream, windowLen, delay).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .format("parquet").option("path", outPath)
      .start()
    q.awaitTermination()
  }
}
