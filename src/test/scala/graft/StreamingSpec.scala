package graft

import graft.streaming.Windows
import org.apache.spark.sql.functions._

/** Structured Streaming execution of the shared window logic: the streaming
  * plans must produce exactly what their batch twins (q45 etc., oracle-
  * checked by the driver) produce on the same input.
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling windows equal the batch twin") {
    val q = Windows.streamTumbling(spark, sf, "stream_tumbling")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_tumbling")
        .orderBy(col("win_start"), col("event_type")).collect()
      val batch = Windows.tumbling(Tables.events(spark, sf))
        .orderBy(col("win_start"), col("event_type")).collect()
      assert(streamed.length > 0)
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("mapGroupsWithState running count converges to the batch group count") {
    val q = Windows.streamRunningCount(spark, sf, "stream_state")
    try {
      q.processAllAvailable()
      // update-mode memory sink holds one row per (user, batch) emission,
      // plus possible timeout tombstones — the per-user max is the final
      // running total either way
      val streamed = spark.table("stream_state")
        .groupBy(col("user_id")).agg(max(col("n_events")).as("n"))
        .orderBy(col("user_id")).collect()
      val batch = Tables.events(spark, sf)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("user_id")).collect()
      assert(streamed.length > 0)
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch interval join") {
    val q = Windows.streamViewPurchase(spark, sf, "stream_vp")
    try {
      q.processAllAvailable()
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2))
      val streamed = spark.table("stream_vp").collect().map(key).toSet
      val batch = Windows.viewPurchasePairs(Tables.events(spark, sf))
        .collect().map(key).toSet
      assert(batch.nonEmpty, "fixture must contain view→purchase pairs")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups to the exact distinct key count") {
    val q = Windows.streamDedup(spark, sf, "stream_dedup")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_dedup").count()
      val exact = Tables.events(spark, sf)
        .select(col("user_id"), col("event_type")).distinct().count()
      assert(streamed === exact)
    } finally q.stop()
  }
}
