package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Exact

/** Event-time windowing logic shared between the BATCH twins (registered as
  * q45/q46, oracle-checked by the driver) and the Structured Streaming
  * runner (exercised by the ScalaTest suite): one definition, two execution
  * modes — the Spark idiom for keeping a streaming pipeline testable
  * (SURVEY.md §2.9).
  */
object Windows {

  /** Tumbling 1-hour windows per event type: count + order-independent
    * decimal-exact sum ([[Exact.dsum]]) + min/max.
    */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Exact.dsum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_value"),
        col("min_value"), col("max_value"))

  /** Sliding 1-hour windows advancing every 30 minutes (each event lands in
    * two windows).
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows with a 30-minute inactivity gap per user: a session
    * closes when the next event arrives ≥ gap after the previous EVENT;
    * session end = last event + gap.
    */
  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))

  /** Structured Streaming variant of [[tumbling]]: parquet file source →
    * 10-minute watermark → windowed aggregation → in-memory sink (named
    * `tableName`). Late data beyond the watermark is dropped; `complete`
    * mode because the memory sink is the test observer. The watermark bounds
    * aggregation state at scale — state eviction is what makes this runnable
    * forever on an unbounded stream.
    */
  def streamTumbling(
      spark: SparkSession, sfDir: String, tableName: String): StreamingQuery = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      // same ns→µs normalization as graft.Tables.events
      .withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      .withWatermark("ts", "10 minutes")
    tumbling(raw)
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("complete")
      .start()
  }

  /** Streaming stateful dedup: drop duplicate (user_id, event_type) pairs
    * arriving within the watermark — `dropDuplicatesWithinWatermark` keeps
    * the dedup state bounded (keys expire with the watermark) where plain
    * dropDuplicates would grow state forever.
    */
  def streamDedup(
      spark: SparkSession, sfDir: String, tableName: String): StreamingQuery = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("append")
      .start()
  }
}
