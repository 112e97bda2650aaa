package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming over the events table (beyond-reference extension;
  * the reference has no streaming surface — SURVEY.md §2.10).
  *
  * The same transform body serves batch and streaming: [[windowedCounts]]
  * takes whichever DataFrame (static `read` or `readStream`) and applies
  * watermark + tumbling window + aggregation, so batch results are the
  * oracle for the streaming path (tested in ScalaTest with a memory sink).
  */
object EventPipeline {

  /** Physical schema of events.parquet: `ts` arrives as INT64 nanoseconds
    * (Spark has no nanosecond timestamp type) — [[readEventStream]]
    * converts it to a microsecond TimestampType.
    */
  def eventsSchema: StructType = new StructType()
    .add("event_id", "long").add("ts", "long").add("user_id", "long")
    .add("event_type", "string").add("value", "double").add("props", "string")

  /** Tumbling-window counts/sums per event type with a 10-minute
    * watermark for late data (no-op in batch mode).
    */
  def windowedCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total"))

  /** Per-user session windows (30-minute gap). */
  def sessionized(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .select(col("session_window.start").as("sstart"),
        col("session_window.end").as("send"),
        col("user_id"), col("n_events"), col("total"))

  /** Open a streaming source over a parquet directory of events, with
    * `ts` converted from int64-nanos to a microsecond timestamp.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
